"""Photometric calibration of reduced-precision serving arithmetic.

XLA's 3-pass fp32 mode (``Precision.HIGH``, the bf16x3 operand split) uses
*truncation* when extracting bf16 limbs, so the dropped lo*lo product has
the sign of x*w: every MXU contraction systematically underestimates
magnitudes.  Per-layer error attribution (results/precision_sensitivity.json)
shows the per-layer flux deficits add nearly linearly — a stable ~1.5e-4
multiplicative flux bias with only ~1e-5-grade data-dependent scatter
around it (vs the north star's <=1e-4 budget; BASELINE.md r4).

A systematic gain is exactly what astronomical pipelines calibrate out.
This module measures the model's per-band flux gain against its own
full-fidelity (HIGHEST, 6-pass) forward on simulated stamps — a one-time
~100-stamp cost at load — and divides it back out of the served
distribution.  Measured result (256 held-out stamps, converged sim_demo
weights): raw HIGH max flux rel err 1.94e-4 -> calibrated 6.0e-5, at
HIGH's ~58k stamps/s instead of HIGHEST's 32.5k.

The scale rides in the variables dict as a ``flux_cal`` collection so it
follows the weights through checkpoints and serving paths; forwards apply
it via :func:`apply_flux_calibration` (a no-op when absent).

Reference anchor: the fidelity target is the reference's true-fp32 Keras
forward (/root/reference/src/debvader/model/model.py:164-218); the
reference itself has no reduced-precision serving to calibrate.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from debvader_tpu.models.distributions import PixelNormal

__all__ = [
    "compute_flux_calibration",
    "attach_flux_calibration",
    "apply_flux_calibration",
]


def compute_flux_calibration(
    model, variables: Any, n: int = 128, seed: int = 11
) -> jax.Array:
    """Per-band flux gain (B,) of ``model``'s forward vs the HIGHEST-
    precision forward of the same weights, on ``n`` simulated stamps.

    Uses z_mode='mean' so the measurement is deterministic; the gain is an
    arithmetic property of the layer stack, not of the latent draw."""
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.models.vae import DeblenderVAE

    cfg = model.cfg
    ref_cfg = dataclasses.replace(
        cfg, dtype="float32", matmul_precision="highest", layer_precision=None
    )
    ref_model = DeblenderVAE(ref_cfg)
    x, _, _ = simulate_batch(
        jax.random.PRNGKey(seed), n, stamp=cfg.stamp_size,
        bands=cfg.nb_of_bands,
    )
    x = jnp.asarray(x, jnp.float32)
    core = {k: variables[k] for k in ("params", "batch_stats") if k in variables}

    @jax.jit
    def band_flux_ratio(core, x):
        loc = model.apply(core, x, z_mode="mean")[0].loc
        ref = ref_model.apply(core, x, z_mode="mean")[0].loc
        return loc.sum(axis=(0, 1, 2)) / ref.sum(axis=(0, 1, 2))

    return band_flux_ratio(core, x)


def attach_flux_calibration(model, variables: Any, **kw) -> Any:
    """Return ``variables`` with a ``flux_cal`` collection added."""
    scale = compute_flux_calibration(model, variables, **kw)
    return dict(variables, flux_cal={"scale": scale})


def apply_flux_calibration(dist: PixelNormal, variables: Any) -> PixelNormal:
    """Divide the calibrated gain out of a served distribution (no-op when
    the variables carry no ``flux_cal``).  Both loc and scale divide: a
    multiplicative arithmetic gain affects the whole distribution."""
    fc = variables.get("flux_cal") if hasattr(variables, "get") else None
    if fc is None:
        return dist
    s = fc["scale"].astype(dist.loc.dtype)
    return PixelNormal(dist.loc / s, dist.scale / s)
