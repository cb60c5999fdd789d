from debvader_tpu.ops.extraction import extract_cutouts, extract_cutouts_host
from debvader_tpu.ops.normalize import (
    denormalize_distribution,
    denormalize_non_linear,
    normalize_non_linear,
)

__all__ = [
    "extract_cutouts",
    "extract_cutouts_host",
    "denormalize_distribution",
    "denormalize_non_linear",
    "normalize_non_linear",
]
