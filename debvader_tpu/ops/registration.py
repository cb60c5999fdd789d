"""On-device subpixel position registration.

Reference (deblend_cutout/optimization.py:6-52): per source,
``scipy.optimize.least_squares`` over (dx, dy) in [-3, 3], minimizing the MSE
between the r-band field and the shifted padded prediction — a host-side
C/Fortran TRF solve with a full-field ``scipy.ndimage.shift`` per residual
evaluation.

TPU-native replacement: bounded Gauss-Newton with analytic Jacobians from
autodiff through the bilinear shift, vmapped over every source in the field
at once.  Fixed iteration count keeps the program static; the 2-parameter
normal equations are solved in closed form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from debvader_tpu.ops.shift import subpixel_shift

__all__ = ["position_optimization", "position_optimization_batch"]


def _objective(s, field_band, pred_band):
    """Mean-squared error between the field and the prediction shifted by s
    (reference optimization.py:22-32, with bilinear interpolation)."""
    return jnp.mean(jnp.square(field_band - subpixel_shift(pred_band, s)))


@partial(jax.jit, static_argnames=("iterations",))
def position_optimization_batch(
    field_band: jax.Array,
    pred_bands: jax.Array,
    detected_offsets: jax.Array,
    bound: float = 3.0,
    iterations: int = 20,
) -> jax.Array:
    """Optimize residual shifts for all sources at once.

    field_band: (F, F) — the r band of the field image.
    pred_bands: (N, S, S) — per-source predicted r-band stamps (NOT padded;
        padding/placement happens inside via the field-sized shift of a
        centered canvas, mirroring optimization.py:40-45).
    detected_offsets: (N, 2) — detection offsets from field center.

    Returns (N, 2) shifts clipped to [-bound, bound].
    """
    # A single non-finite field pixel (chip gap) would turn every source's
    # normal equations NaN (the residual covers the whole field, and
    # 0 * NaN = NaN in jac.T @ r); registration treats gaps as background.
    field_band = jnp.where(jnp.isfinite(field_band), field_band, 0.0)
    f = field_band.shape[0]
    s = pred_bands.shape[1]
    pos0 = (f - s) // 2

    def place(pred, off):
        canvas = jnp.zeros((f, f), pred.dtype)
        canvas = jax.lax.dynamic_update_slice(canvas, pred, (pos0, pos0))
        # base prediction positioned at the detected offset
        return subpixel_shift(canvas, off)

    def solve_one(pred, off):
        base = place(pred, off)

        def gn_step(_, x):
            # Gauss-Newton on r(x) = field - shift(base, x)
            def resid(xx):
                return (field_band - subpixel_shift(base, xx)).ravel()

            r = resid(x)
            jac = jax.jacfwd(resid)(x)  # (F*F, 2)
            jtj = jac.T @ jac + 1e-6 * jnp.eye(2)
            jtr = jac.T @ r
            dx = -jnp.linalg.solve(jtj, jtr)
            return jnp.clip(x + dx, -bound, bound)

        x0 = jnp.zeros((2,), jnp.float32)
        return jax.lax.fori_loop(0, iterations, gn_step, x0)

    return jax.vmap(solve_one)(pred_bands, detected_offsets.astype(jnp.float32))


def position_optimization(
    field_image,
    output_image_mean_padded,
    galaxy_distance_to_center,
    bound: float = 3.0,
    iterations: int = 20,
    detection_band: int = 2,
):
    """Single-source reference-signature wrapper (optimization.py:6-52).

    ``output_image_mean_padded`` is the field-size padded prediction like the
    reference passes; returns (shift_x, shift_y).
    """
    import numpy as np

    field_band = jnp.asarray(field_image[..., detection_band], jnp.float32)
    pred_padded = jnp.asarray(
        output_image_mean_padded[..., detection_band], jnp.float32
    )
    f = field_band.shape[0]

    base = subpixel_shift(
        pred_padded, jnp.asarray(galaxy_distance_to_center, jnp.float32)
    )

    def resid(x):
        return (field_band - subpixel_shift(base, x)).ravel()

    @jax.jit
    def solve():
        def gn_step(_, x):
            r = resid(x)
            jac = jax.jacfwd(resid)(x)
            jtj = jac.T @ jac + 1e-6 * jnp.eye(2)
            dx = -jnp.linalg.solve(jtj, jac.T @ r)
            return jnp.clip(x + dx, -bound, bound)

        return jax.lax.fori_loop(0, iterations, gn_step, jnp.zeros((2,), jnp.float32))

    out = np.asarray(solve())
    return float(out[0]), float(out[1])
