"""Typed configuration for the whole framework.

The reference has no config system — every constant is hard-coded at its use
site (survey: SURVEY.md §5 "Config / flag system — ABSENT").  These dataclasses
collect those constants so the zero-argument defaults reproduce reference
behavior exactly; citations point at where each default lives in
/root/reference.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the convolutional VAE.

    Defaults mirror the fixed architecture at
    reference training/train.py:104-107 (59x59xB input, latent 32,
    filters [32,64,128,256], 3x3 kernels) and the probabilistic heads at
    model/model.py:154-159 (pixel-Normal scale floor 1e-4) and
    model/model.py:49,211 (TriL diag shift 1e-5, KL weight 0.01).
    """

    stamp_size: int = 59
    nb_of_bands: int = 6
    latent_dim: int = 32
    filters: Sequence[int] = (32, 64, 128, 256)
    kernels: Sequence[int] = (3, 3, 3, 3)
    scale_floor: float = 1e-4
    diag_shift: float = 1e-5
    kl_weight: float = 0.01
    # Compute dtype for the conv/dense stacks.  Params are always float32;
    # bfloat16 here feeds the MXU at double rate.  Defaults to float32 so the
    # zero-config path is reference-faithful.
    dtype: str = "float32"
    # The reference casts to float32 before the decoder's big Dense
    # (model/model.py:117).  Keep True for weight-parity; False runs that
    # Dense in the compute dtype (faster in bfloat16 mode).
    strict_cast: bool = True
    # Run the decoder's stride-2 ConvTranspose layers in the sub-pixel
    # formulation (dense 2x2 conv + depth-to-space, see
    # models/layers.py:pack_subpixel_kernel).  Numerically equivalent and
    # checkpoint-compatible; trades 16/9x FLOPs for MXU lane occupancy at
    # the lane-bound decoder-tail shapes.
    decoder_subpixel: bool = False
    # Run the LAST N decoder ConvTranspose stage-pairs — and, when N > 0,
    # the final band conv — in float32 regardless of `dtype`.  NOTE
    # (round-3 re-measurement, retrained sim_demo weights): with CONVERGED
    # weights the bf16-vs-fp32 flux error is distributed across the whole
    # network (~2.5e-3 mean / 8e-3 max, encoder and decoder contributing
    # comparably), so this flag no longer isolates it — the earlier
    # decoder-late-stage attribution (enc16+dec32 at 1e-6) held only for
    # the barely-trained r2 demo checkpoint.  The <=1e-4 serving mode is
    # fidelity_serving_config() (fp32 HIGH + flux calibration, r4).  The
    # flag remains a checkpoint-compatible mechanism (tests/test_model.py
    # pins the dtype split).  0 = everything in `dtype` (the fast default).
    decoder_f32_stages: int = 0
    # MXU pass count for float32 matmuls/convs (jax.lax.Precision).  On TPU
    # the hardware multiplies in bfloat16; None/'default' = one pass (each
    # fp32 input ROUNDED to bf16 — fast, bf16-grade products with fp32
    # accumulation), 'high' = 3 passes (bf16x3 operand splitting — drops
    # the lo*lo term), 'highest' = 6 passes (full fp32 fidelity).
    # Measured ladder vs true fp32 (scripts/bench_precision.py, converged
    # sim_demo weights): default 6.7e-3 max flux rel err, high 1.85e-4
    # (a systematic truncation BIAS — see utils/flux_cal.py), highest
    # 1.1e-6.  The DC2 <=1e-4-vs-Keras fidelity clause is met by 'high'
    # PLUS flux calibration (6.5e-5 at 1.78x the 'highest' throughput;
    # fidelity_serving_config / BASELINE.md r4).  Irrelevant off-TPU and
    # for dtype='bfloat16' stages.
    matmul_precision: str | None = None
    # Per-layer precision overrides: ((layer_key, rung), ...) pairs (a dict
    # is accepted and canonicalized).  Layer keys name every MXU layer:
    # 'enc/Conv_0'..'enc/Conv_{2S-1}', 'enc/Dense_0', 'dec/Dense_0',
    # 'dec/Dense_1', 'dec/ConvT_0'..'dec/ConvT_{2S-1}' (application order,
    # 0 = deepest), 'dec/Conv_0' (band head).  Rungs are the XLA-native
    # 'default'/'high'/'highest' plus the explicit bf16-limb schemes of
    # models/precision.py ('bf16x1/3/4/5/6/9') — bf16x9 is the exact fp32
    # product lane-packed into ~3 one-pass costs at the low-channel decoder
    # tail.  Unlisted layers fall back to `matmul_precision`.  Only
    # meaningful for float32 compute.
    layer_precision: tuple | None = None
    # Execute the XLA-native rungs via explicit bf16 limbs (models/precision
    # EMULATION map) so the CPU backend reproduces TPU MXU arithmetic —
    # the error side of precision-placement search runs on host.
    limb_emulation: bool = False

    _RUNGS = ("default", "high", "highest", "bf16x1", "bf16x2", "bf16x2t",
              "bf16x3t", "bf16x3", "bf16x4", "bf16x5", "bf16x6", "bf16x9")

    def __post_init__(self):
        if not 0 <= self.decoder_f32_stages <= len(self.filters):
            raise ValueError(
                f"decoder_f32_stages must be in [0, {len(self.filters)}], "
                f"got {self.decoder_f32_stages}"
            )
        if self.matmul_precision not in (None, "default", "high", "highest"):
            raise ValueError(
                "matmul_precision must be None, 'default', 'high' or "
                f"'highest', got {self.matmul_precision!r}"
            )
        if self.layer_precision is not None:
            items = (
                tuple(sorted(self.layer_precision.items()))
                if isinstance(self.layer_precision, dict)
                else tuple(tuple(kv) for kv in self.layer_precision)
            )
            valid_keys = self.precision_layer_keys()
            for key, rung in items:
                if key not in valid_keys:
                    # A typo'd key would silently fall back to
                    # matmul_precision — in a precision-placement workflow
                    # that is a silently non-compliant serving mode.
                    raise ValueError(
                        f"layer_precision key {key!r} names no MXU layer of "
                        f"this architecture; valid keys: {sorted(valid_keys)}"
                    )
                if rung not in self._RUNGS:
                    raise ValueError(
                        f"layer_precision[{key!r}] must be one of "
                        f"{self._RUNGS}, got {rung!r}"
                    )
            object.__setattr__(self, "layer_precision", items)

    def precision_layer_keys(self) -> frozenset:
        """The enumerable MXU-layer key set `layer_precision` may name
        (models/vae.py threads these through models/precision.py)."""
        s = len(self.filters)
        return frozenset(
            [f"enc/Conv_{i}" for i in range(2 * s)]
            + [f"dec/ConvT_{i}" for i in range(2 * s)]
            + ["enc/Dense_0", "dec/Dense_0", "dec/Dense_1", "dec/Conv_0"]
        )

    def layer_rung(self, key: str) -> str | None:
        """Precision rung for one MXU layer, or None = use matmul_precision."""
        if self.layer_precision:
            for k, rung in self.layer_precision:
                if k == key:
                    return rung
        return None

    @property
    def input_shape(self) -> tuple[int, int, int]:
        return (self.stamp_size, self.stamp_size, self.nb_of_bands)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def lax_precision(self):
        if self.matmul_precision is None:
            return None
        import jax

        return jax.lax.Precision(self.matmul_precision)


def fidelity_serving_config(**overrides) -> "ModelConfig":
    """The current <=1e-4-fidelity-clause serving configuration.

    Single source of truth for "the compliant mode": bench.py, the CLI and
    dc2_parity_check all build from here, so a faster compliant mode adopted
    in one place propagates everywhere.  The clause (BASELINE.json
    north_star) is <=1e-4 relative total-flux error vs the reference's true
    fp32 Keras forward (/root/reference/src/debvader/model/model.py:164-218);
    the measured ladder lives in scripts/bench_precision.py / BASELINE.md.

    Round-4 mode: 3-pass HIGH arithmetic plus per-band photometric
    calibration of its systematic truncation bias (utils/flux_cal.py) —
    measured max flux rel err 6.0e-5 at ~1.8x the throughput of the
    round-3 HIGHEST mode.  Weights must be loaded with
    ``load_deblender(..., flux_calibration=True)`` (this config's
    ``requires_flux_calibration`` marker is how loaders know).
    """
    kw = dict(dtype="float32", matmul_precision="high")
    kw.update(overrides)
    return ModelConfig(**kw)


# Marker consulted by bench.py / CLI: the fidelity mode above is only
# compliant when the flux_cal collection is attached at load.
FIDELITY_NEEDS_FLUX_CAL = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training defaults (reference training/train.py:90,126; model.py:213)."""

    learning_rate: float = 1e-4
    batch_size: int = 5
    epochs: int = 10
    kl_weight: float = 0.01
    # 'analytic' = closed-form KL(MVN||N(0,I)); 'mc' = single-sample estimate,
    # which is what tfp.layers.KLDivergenceRegularizer actually computes in
    # the reference (model/model.py:211-214, default use_exact_kl=False).
    kl_mode: str = "analytic"
    # Optional linear beta-anneal of the KL weight over this many steps
    # (0 disables; an extension over the reference's fixed 0.01).
    kl_anneal_steps: int = 0
    seed: int = 0
    shuffle: bool = True


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    """SExtractor-equivalent detection (reference detect/detection.py:19-46)."""

    thresh: float = 1.5  # in units of global background RMS
    minarea: int = 4
    deblend_nthresh: int = 64  # reference value (detect/detection.py:20);
    # on DC2 fields 2/3, 64 vs 32 levels changes counts by +14/+18 of ~700
    # (extra close-pair splits) with identical truth-match quality.
    deblend_cont: float = 1e-5
    background_box: int = 64  # sep.Background default bw/bh
    filter_fwhm: float = 3.0  # 7x7 gaussian matched filter, FWHM 3 px
    filter_size: int = 7
    detection_band: int = 2  # r band (detect/detection.py:14)
    # Detection-threshold normalization for the filtered image:
    #   'sep_conv' -> thresh * rms, matching sep filter_type='conv' (the
    #                 reference's behavior: the unnormalized convolution is
    #                 compared against the unfiltered-noise threshold), so
    #                 the zero-config path is reference-faithful; default.
    #   'matched'  -> thresh * rms * ||k||_2, the statistically correct
    #                 matched-filter significance (an effectively ~2.2x
    #                 higher threshold for the 7x7 kernel).  On DC2 fields
    #                 2/3 'sep_conv' finds 699/763 sources vs 382/384 for
    #                 'matched', same truth-match quality (PARITY.md).
    threshold_scaling: str = "sep_conv"
    # Use the fused Pallas matched-filter kernel instead of the XLA conv
    # chain (kernels/matched_filter.py; measured at parity on v5e).
    # Single-field backend; the batched/tiled path supersedes it with the
    # fused detect kernel below.
    use_pallas_filter: bool = False
    # Fully fused detect core (kernels/detect_fused.py): matched filter +
    # threshold + watershed parents + direction codes in one VMEM pass
    # feeding the label-resolution fixpoint.  None = auto (on when running
    # on TPU); True forces it (interpreter mode off-TPU, for tests); False
    # disables.  Composes with detect_sources_batched, including the
    # mesh-sharded path (the tile stack shard_maps over 'data' and the
    # fused core runs per shard — every stage is per-tile independent).
    use_pallas_fused: bool | None = None
    # Fused Pallas label-resolution step (kernels/label_select.py) for the
    # watershed ascent iteration — one VMEM pass per step vs the XLA select
    # chain's ~5x-off-roofline traffic.  TPU only; XLA path elsewhere.
    use_pallas_select: bool = True
    # Sort-free sigma-clipped background statistics via the Pallas
    # counting-selection kernel (kernels/clipped_stats.py; ~3x the XLA
    # sort-once path at production shapes).  None = auto (on when running
    # on TPU); medians are exact rank statistics either way, mean/std
    # differ only in float summation order.
    use_pallas_clip: bool | None = None
    # SExtractor-style CLEAN pass: drop detections whose filtered peak is
    # explained by a brighter neighbor's PSF wings (sep.extract defaults to
    # clean=True, clean_param=1.0, which the reference inherits).
    clean: bool = True
    clean_param: float = 1.0
    # Deblending algorithm for splitting islands into objects:
    #   'watershed' -> (default) every-local-max watershed split + the
    #                  quantized-criterion merge (runtime/segmerge.cpp) —
    #                  a documented, measured divergence from sep
    #                  (PARITY.md; truth-match median <1 px).
    #   'lutz'      -> sep-faithful multi-threshold component TREE
    #                  (runtime/segmerge.cpp dvm_lutz): 64 exponential
    #                  sub-thresholds per island, branch significance by
    #                  flux fraction with >=2-significant-sibling
    #                  separation, bivariate-Gaussian gatherup of shared
    #                  pixels — the SExtractor deblender the reference's
    #                  sep.extract runs (detect/detection.py:37-46).
    #                  Opt-in (requires the native toolchain).
    deblend_algo: str = "watershed"

    def __post_init__(self):
        if self.deblend_algo not in ("watershed", "lutz"):
            raise ValueError(
                f"deblend_algo must be 'watershed' or 'lutz', got "
                f"{self.deblend_algo!r}"
            )


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Scene-pipeline defaults (reference deblend/field_deblender.py)."""

    cutout_size: int = 59  # field_deblender.py:17
    nb_of_bands: int = 6  # field_deblender.py:18
    epistemic_samples: int = 100  # field_deblender.py:308
    mse_window: int = 5  # +-5 px central window, field_deblender.py:323-324
    position_bounds: float = 3.0  # optimization.py:46
    epistemic_criterion: float = 100.0  # field_deblender.py:224
    mse_criterion: float = 100.0  # field_deblender.py:225
    gn_iterations: int = 20  # Gauss-Newton steps for position optimization
    # Interpolation order for residual/predicted field assembly: 3 matches
    # the reference's scipy.ndimage.shift default (ops/spline.py); 1 =
    # bilinear, cheaper.  Registration uses bilinear either way.
    interp_order: int = 3
    tile_size: int = 1024  # tile edge for very large fields
    tile_overlap: int = 64
    # Per-source pipeline batch: fields with more detections than this are
    # deblended in chunks so cutouts/forwards never exceed device memory
    # (a 4k coadd can hold 1e5+ detections; 1e5 x 59x59x6 fp32 is ~8 GB).
    # The streaming serving path additionally caps the chunk from the HBM
    # budget below once the field + render canvas claim their share.
    source_chunk: int = 8192
    # Device HBM the streaming serving path may plan against (v5e: 16 GB).
    # _stream_deblend holds the field and the padded render canvas
    # (~2 x F^2 x B x 4 bytes) for the whole stream, so the per-chunk
    # forward is sized to what's left; past ~10k^2 fields the default
    # 8192-source chunk no longer fits alongside them.
    serving_hbm_bytes: int = 16 << 30
    # HBM budget for deblend_field's device-resident render cache (mean +
    # stddev + epistemic stamp maps kept for a following residual/predicted
    # render).  Larger results skip the cache rather than pin gigabytes.
    render_cache_bytes: int = 1 << 30
