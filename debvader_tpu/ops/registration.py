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

import math
from functools import partial

import jax
import jax.numpy as jnp

from debvader_tpu.ops.shift import subpixel_shift, subpixel_shift_const

__all__ = [
    "position_optimization",
    "position_optimization_batch",
    "position_optimization_batch_windowed",
    "registration_window",
]


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


def registration_window(stamp_size: int, bound: float) -> int:
    """Window side for ``position_optimization_batch_windowed``.

    The Gauss-Newton normal equations only receive contributions from
    pixels where d shift(base, x)/dx is nonzero — the shifted prediction's
    support.  That support is the stamp plus: the fractional part of the
    detected offset (<1 px), one bilinear tap for the base placement, the
    shift bound, and one more bilinear tap for the inner shift — so a
    window of stamp + 2*(ceil(bound) + 3) covers it with a row to spare.
    """
    return stamp_size + 2 * (math.ceil(bound) + 3)


@partial(jax.jit, static_argnames=("iterations", "bound"))
def position_optimization_batch_windowed(
    field_band: jax.Array,
    pred_bands: jax.Array,
    detected_offsets: jax.Array,
    bound: float = 3.0,
    iterations: int = 20,
    row_bounds: tuple | None = None,
) -> jax.Array:
    """``position_optimization_batch`` on per-source windows: same math,
    O(N * window^2) instead of O(N * F^2) per Gauss-Newton iteration.

    The full-field objective (reference optimization.py:22-32) sums the
    squared residual over the WHOLE field, but the Jacobian of
    ``shift(base, x)`` w.r.t. the 2 shift parameters is exactly zero
    outside the shifted prediction's support, so every J^T J / J^T r term
    from pixels outside a window covering that support is exactly 0.0 —
    the windowed normal equations equal the full-field ones up to float
    summation order.  At survey scale this is the difference between
    registration being unusable (each source touching all F^2 pixels per
    iteration — 16.7M at 4k) and costing ~5k pixels per source.

    Window placement follows the full-field placement exactly: the stamp
    sits at ``pos0 + floor(off)`` (the integer part of the detected offset
    moves the window, not the interpolation), and the fractional part
    becomes a [0,1) bilinear shift with the same tap weights the
    full-field ``subpixel_shift(canvas, off)`` uses.  Windows clamp to the
    field extent, so a support clipped by the field border in the
    full-field version is clipped at the same pixels here.

    field_band: (H, W) — rectangular fields are supported (the sharded
    serving path registers against row bands).  Offsets keep the existing
    convention: relative to the array center via pos0 = (dim - S) // 2.

    ``row_bounds``: optional (lo, hi) row range (array coordinates, hi
    exclusive) the window must stay inside — the sharded serving path
    passes the true field's extent so a band's synthetic zero halo rows
    beyond the global field edge clamp the window exactly where the
    full-field solve's border would (the clamped window edge then
    coincides with the field edge, reproducing the border clipping).
    Defaults to the whole array.
    """
    field_band = jnp.where(jnp.isfinite(field_band), field_band, 0.0)
    h, w = field_band.shape
    s = pred_bands.shape[1]
    win = registration_window(s, bound)
    if win > min(h, w):
        if row_bounds is not None or h != w:
            raise ValueError(
                f"field ({h}, {w}) is smaller than the {win}px registration "
                f"window and the full-field fallback cannot honor "
                f"row_bounds / rectangular bands — use a field of at least "
                f"{win}px or a smaller shift bound"
            )
        # tiny fields: the window IS the field — use the full-field solve
        return position_optimization_batch(
            field_band, pred_bands, detected_offsets, bound, iterations
        )
    margin = (win - s) // 2
    pos0 = jnp.asarray([(h - s) // 2, (w - s) // 2], jnp.int32)
    if row_bounds is None:
        row_lo, row_hi = 0, h
    else:
        row_lo, row_hi = row_bounds
    g_lo = jnp.asarray([row_lo, 0], jnp.int32)
    lim = jnp.stack(
        [jnp.asarray(row_hi, jnp.int32) - win, jnp.asarray(w - win, jnp.int32)]
    )

    offs = detected_offsets.astype(jnp.float32)
    ioff = jnp.floor(offs).astype(jnp.int32)
    frac = offs - ioff  # in [0, 1) per axis
    # Pad so the Gauss-Newton inner shift is a dynamic SLICE of the padded
    # base plus a two-tap blend instead of subpixel_shift's per-pixel
    # clip-gathers (gathers scalarize on TPU; this is the difference
    # between ~4 ms and ~10 us per source).  bp covers |floor(x)| + the
    # extra blend row for any x in [-bound, bound].
    bp = math.ceil(bound) + 1

    rows = jax.lax.broadcasted_iota(jnp.float32, (win, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, win), 1)

    def solve_one(pred, io, fr):
        g = jnp.clip(pos0 + io - margin, g_lo, lim)
        fw = jax.lax.dynamic_slice(field_band, (g[0], g[1]), (win, win))
        # Place the stamp into a margin-padded canvas and slice the window
        # out: a border-flush source can have pos0 + floor(off) up to 2 px
        # BEFORE the clamped window origin, and dynamic_update_slice on a
        # bare (win, win) canvas would CLAMP the placement (shifting the
        # whole stamp) where the full-field solve CLIPS the overhanging
        # rows at the field edge.  The pad absorbs the overhang and the
        # slice discards it, exactly like the field edge does.
        big = win + 2 * margin
        canvas = jnp.zeros((big, big), pred.dtype)
        p = pos0 + io - g + margin  # stamp placement inside the padded canvas
        canvas = jax.lax.dynamic_update_slice(canvas, pred, (p[0], p[1]))
        base = subpixel_shift_const(canvas, fr)[
            margin : margin + win, margin : margin + win
        ]
        base_p = jnp.pad(base, bp)

        def shift_win(x):
            """subpixel_shift(base, x), bit-equal, gather-free: the
            integer part indexes a (win+1, win+1) dynamic slice of the
            zero-padded base (zero pad == subpixel_shift's zeroed
            out-of-extent taps), the fractional part is a two-tap blend,
            and the final mask reproduces the outright-cval semantics at
            the window extent.

            The decomposition uses frac in (0, 1] (ix = ceil(x) - 1), not
            [0, 1): at an exact-integer shift — the Gauss-Newton START,
            x0 = 0 — bilinear interpolation sits on a knot where the two
            half-open conventions pick OPPOSITE one-sided derivatives
            (backward vs forward difference).  Values agree either way,
            but jacfwd through the [0,1) form took a different first GN
            step than subpixel_shift's floor(i - x) tap pair; (0, 1]
            reproduces subpixel_shift's knot derivative exactly."""
            ix = jnp.ceil(x).astype(jnp.int32) - 1
            f2 = x - ix
            ext = jax.lax.dynamic_slice(
                base_p, (bp - ix[0] - 1, bp - ix[1] - 1), (win + 1, win + 1)
            )
            tmp = f2[0] * ext[:win] + (1.0 - f2[0]) * ext[1 : win + 1]
            out = f2[1] * tmp[:, :win] + (1.0 - f2[1]) * tmp[:, 1 : win + 1]
            inside = (
                (rows >= x[0])
                & (rows <= win - 1 + x[0])
                & (cols >= x[1])
                & (cols <= win - 1 + x[1])
            )
            return jnp.where(inside, out, 0.0)

        def gn_step(_, x):
            def resid(xx):
                return (fw - shift_win(xx)).ravel()

            r = resid(x)
            jac = jax.jacfwd(resid)(x)
            jtj = jac.T @ jac + 1e-6 * jnp.eye(2)
            dx = -jnp.linalg.solve(jtj, jac.T @ r)
            return jnp.clip(x + dx, -bound, bound)

        # exact zeros derived from fr so the loop carry keeps fr's varying
        # manual axes when this runs inside shard_map (a constant carry
        # would not type-match the band-varying gn_step output)
        x0 = fr * 0.0
        return jax.lax.fori_loop(0, iterations, gn_step, x0)

    return jax.vmap(solve_one)(pred_bands, ioff, frac)


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
