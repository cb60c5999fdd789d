from debvader_tpu.ops.detection import (
    detect_objects,
    detect_sources,
    estimate_background,
)
from debvader_tpu.ops.extraction import extract_cutouts, extract_cutouts_host
from debvader_tpu.ops.measure import (
    centroid,
    ellipticity,
    flux,
    measure_batch,
    second_moments,
    snr,
)
from debvader_tpu.ops.normalize import (
    denormalize_distribution,
    denormalize_non_linear,
    normalize_non_linear,
)
from debvader_tpu.ops.registration import (
    position_optimization,
    position_optimization_batch,
    position_optimization_batch_windowed,
)
from debvader_tpu.ops.shift import render_field, shift_full, subpixel_shift
from debvader_tpu.ops.spline import spline_prefilter, subpixel_shift_spline

__all__ = [
    "detect_objects",
    "detect_sources",
    "estimate_background",
    "extract_cutouts",
    "extract_cutouts_host",
    "centroid",
    "ellipticity",
    "flux",
    "measure_batch",
    "second_moments",
    "snr",
    "denormalize_distribution",
    "denormalize_non_linear",
    "normalize_non_linear",
    "position_optimization",
    "position_optimization_batch",
    "position_optimization_batch_windowed",
    "render_field",
    "shift_full",
    "subpixel_shift",
    "spline_prefilter",
    "subpixel_shift_spline",
]
