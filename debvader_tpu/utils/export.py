"""Ahead-of-time export of the deblender forward pass.

The reference exports to ONNX via tf2onnx for deployment
(notebooks/deblender_to_onnx.ipynb, SURVEY.md §2 row 18), swapping the TFP
heads for hand-rolled samplers so the graph serializes.  The TPU-native
equivalent is ``jax.export``: the jitted forward — including the MVN-TriL
sampling and the Normal head, no swaps needed — serializes to a portable
StableHLO artifact that reloads and runs without the framework or the model
code, on any machine with jax.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from debvader_tpu.models.vae import DeblenderVAE

__all__ = [
    "export_deblender",
    "load_exported",
    "artifact_forward",
    "roundtrip_check",
]


def _forward_fn(model: DeblenderVAE, z_mode: str):
    def fn(variables, images, rng):
        from debvader_tpu.utils.flux_cal import apply_flux_calibration

        core = (
            {k: v for k, v in variables.items() if k != "flux_cal"}
            if hasattr(variables, "items")
            else variables
        )
        dist, _ = model.apply(core, images, rng=rng, z_mode=z_mode)
        # The fidelity mode's photometric correction must bake into the
        # artifact: an exported HIGH-precision forward without it would
        # silently serve the uncalibrated ~1.9e-4-bias outputs while the
        # config claims <=1e-4 compliance (utils/flux_cal.py).
        dist = apply_flux_calibration(dist, variables)
        return dist.loc, dist.scale

    return fn


def export_deblender(
    model: DeblenderVAE,
    variables: Any,
    batch_size: int | None = None,
    z_mode: str = "sample",
    path: str | Path | None = None,
) -> bytes:
    """Serialize the full forward (params baked in) to StableHLO bytes.

    The exported callable takes (images, rng_key_data) and returns
    (mean, stddev) like the reference's ONNX session returns the sampler
    outputs (deblender_to_onnx.ipynb cells 15-16).

    ``batch_size=None`` (default) exports with a *symbolic* batch dimension
    so one artifact serves any batch — required for the serving pipeline's
    bucket-padded batches (api.padded_forward).  A fixed int pins the
    batch shape (the pre-r4 behavior).
    """
    cfg = model.cfg
    fwd = _forward_fn(model, z_mode)

    def wrapped(images, key_data):
        rng = jax.random.wrap_key_data(key_data)
        return fwd(variables, images, rng)

    batch_dim = (
        jax_export.symbolic_shape("b")[0] if batch_size is None else batch_size
    )
    images_spec = jax.ShapeDtypeStruct(
        (batch_dim, cfg.stamp_size, cfg.stamp_size, cfg.nb_of_bands),
        jnp.float32,
    )
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    exported = jax_export.export(jax.jit(wrapped))(images_spec, key_spec)
    blob = bytes(exported.serialize())
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def load_exported(blob: bytes | str | Path):
    """Deserialize an exported deblender; returns a callable
    (images, key_data) -> (mean, stddev)."""
    if not isinstance(blob, (bytes, bytearray)):
        blob = Path(blob).read_bytes()
    exported = jax_export.deserialize(bytearray(blob))
    return exported.call


def artifact_forward(blob: bytes | str | Path, normalise: bool = False):
    """Serving closure over an exported artifact: ``(images, rng) ->
    (loc, scale)`` with the standard pre/post bracket (finite guard,
    optional tanh-arcsinh normalize / delta-method denormalize) applied
    around the baked-in forward — the same contract as
    make_quantized_forward, so ``api.padded_forward`` and the scene
    pipeline can consume an artifact anywhere they consume the live model.
    Cold-start cost is the artifact's backend compile only: no tracing or
    lowering of the model code (utils/compile_cache makes repeat processes
    skip even that)."""
    call = load_exported(blob)

    @jax.jit
    def bracket_in(images):
        x = jnp.asarray(images, jnp.float32)
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        if normalise:
            from debvader_tpu.ops.normalize import normalize_non_linear

            x = normalize_non_linear(x)
        return x

    def fwd(images, rng):
        loc, scale = call(bracket_in(images), jax.random.key_data(rng))
        if normalise:
            from debvader_tpu.models.distributions import PixelNormal
            from debvader_tpu.ops.normalize import denormalize_distribution

            dist = denormalize_distribution(PixelNormal(loc, scale))
            return dist.loc, dist.scale
        return loc, scale

    return fwd


def roundtrip_check(
    model: DeblenderVAE, variables: Any, images, rtol: float = 1e-5
) -> bool:
    """Export -> reload -> compare against the live model (the parity check
    the reference does against onnxruntime)."""
    images = jnp.asarray(images, jnp.float32)
    blob = export_deblender(model, variables, batch_size=images.shape[0])
    call = load_exported(blob)
    key = jax.random.PRNGKey(42)
    key_data = jax.random.key_data(key)
    got_mean, got_std = call(images, key_data)
    want_mean, want_std = _forward_fn(model, "sample")(
        variables, images, jax.random.wrap_key_data(key_data)
    )
    ok_mean = np.allclose(np.asarray(got_mean), np.asarray(want_mean), rtol=rtol, atol=1e-5)
    ok_std = np.allclose(np.asarray(got_std), np.asarray(want_std), rtol=rtol, atol=1e-5)
    return bool(ok_mean and ok_std)
