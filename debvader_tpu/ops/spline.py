"""Cubic B-spline (order-3) subpixel shift with scipy-exact semantics.

The reference's residual/predicted field assembly and position optimizer
shift images with ``scipy.ndimage.shift`` at its default ``order=3``
(deblend/field_deblender.py:93,164-182, deblend_cutout/optimization.py:29,41).
SURVEY.md §7 hard part (c) flags spline parity as a deliverable; this module
closes it:

- **prefilter**: the causal/anticausal pole filter (z = sqrt(3) - 2) that
  converts samples to B-spline coefficients, with the exact mirror-boundary
  closed-form init scipy uses, run as a ``lax.scan`` per axis (vmapped over
  the other axis and channels);
- **interpolation**: 4x4 tensor-product cubic B-spline taps with mirrored
  coefficient indexing; sample positions outside the input extent return 0
  (scipy ``mode='constant'``).

Verified against scipy.ndimage.shift(order=3, mode='constant') to ~1e-6
including borders (tests/test_spline.py).  The bilinear path
(ops/shift.subpixel_shift) remains the default for speed; pipelines opt in
via PipelineConfig.interp_order = 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "spline_prefilter",
    "subpixel_shift_spline",
    "subpixel_shift_spline_const",
]

_POLE = np.sqrt(3.0) - 2.0


def _prefilter_last_axis(x: jax.Array) -> jax.Array:
    """B-spline coefficient filter along the last axis (mirror boundary)."""
    z = _POLE
    n = x.shape[-1]
    c = 6.0 * x

    # Exact mirror init for the causal pass:
    # cp[0] = (c[0] + z^(n-1) c[n-1] + sum_m (z^m + z^(2n-2-m)) c[m]) /
    #         (1 - z^(2n-2))
    k = np.arange(n)
    w = np.power(z, k) + np.power(z, 2 * n - 2 - k)
    w[0] = 1.0  # x[0] appears once per period
    w[n - 1] = z ** (n - 1)  # so does x[n-1]
    w = w / (1.0 - z ** (2 * n - 2))
    cp0 = jnp.tensordot(c, jnp.asarray(w, c.dtype), axes=([-1], [0]))

    def fwd(carry, ci):
        out = ci + z * carry
        return out, out

    _, cp_rest = jax.lax.scan(
        fwd, cp0, jnp.moveaxis(c[..., 1:], -1, 0)
    )
    cp = jnp.concatenate(
        [cp0[..., None], jnp.moveaxis(cp_rest, 0, -1)], axis=-1
    )

    cm_last = (z / (z * z - 1.0)) * (cp[..., -1] + z * cp[..., -2])

    def bwd(carry, cpi):
        out = z * (carry - cpi)
        return out, out

    _, cm_rest = jax.lax.scan(
        bwd, cm_last, jnp.moveaxis(cp[..., :-1], -1, 0), reverse=True
    )
    return jnp.concatenate(
        [jnp.moveaxis(cm_rest, 0, -1), cm_last[..., None]], axis=-1
    )


def spline_prefilter(img: jax.Array) -> jax.Array:
    """2D cubic-spline coefficients for (H, W) or (H, W, C) images."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    # (H, W, C): filter W (move C out of the way), then H.
    c = _prefilter_last_axis(jnp.moveaxis(img, -1, 0))  # (C, H, W) filter W
    c = _prefilter_last_axis(jnp.swapaxes(c, -1, -2))  # filter H
    c = jnp.moveaxis(jnp.swapaxes(c, -1, -2), 0, -1)  # back to (H, W, C)
    return c[..., 0] if squeeze else c


def _bspline3_weights(t: jax.Array):
    """Cubic B-spline weights for taps at offsets (-1, 0, 1, 2) from
    floor(pos); t = frac(pos) in [0, 1)."""
    t2 = t * t
    t3 = t2 * t
    w0 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0  # beta(t + 1)
    w1 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0      # beta(t)
    w2 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0  # beta(t - 1)
    w3 = t3 / 6.0                                # beta(t - 2)
    return w0, w1, w2, w3


def _mirror(idx: jax.Array, n: int) -> jax.Array:
    """Reflect indices into [0, n-1] (period 2(n-1), no edge repeat)."""
    idx = jnp.abs(idx)
    return jnp.where(idx > n - 1, 2 * (n - 1) - idx, idx)


def _bspline3(d: jax.Array) -> jax.Array:
    """Cubic B-spline basis evaluated at (possibly traced) distance d."""
    a = jnp.abs(d)
    inner = (4.0 - 6.0 * a * a + 3.0 * a * a * a) / 6.0
    outer = jnp.where(a < 2.0, (2.0 - a) ** 3 / 6.0, 0.0)
    return jnp.where(a < 1.0, inner, outer)


def subpixel_shift_spline_const(img: jax.Array, shift: jax.Array) -> jax.Array:
    """``subpixel_shift_spline`` specialized to a constant per-image shift
    with fractional parts in [0, 1) — the case the field renderer produces
    after splitting integer offsets.

    The sample position i - f has the same fractional placement at every
    pixel, so the 4x4 per-pixel tap gather collapses into 5 + 5 separable
    shifted slices with scalar B-spline weights (B3(k + f) for k = -2..2;
    the two edge taps vanish at the f = 0 / f -> 1 ends).  Gather-free:
    on TPU the generic path's 16 coefficient gathers dominate field
    rendering; this form is pure shifted multiply-adds (measured parity
    with the generic path in tests/test_spline.py).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape
    coef = spline_prefilter(img)
    # mirror boundary (reflect, no edge repeat) matches _mirror's indexing
    coef_p = jnp.pad(coef, ((2, 2), (2, 2), (0, 0)), mode="reflect")

    fy, fx = shift[0], shift[1]
    tmp = 0.0
    for k in range(-2, 3):
        tmp = tmp + _bspline3(k + fy) * coef_p[2 + k : 2 + k + h, :, :]
    out = 0.0
    for k in range(-2, 3):
        out = out + _bspline3(k + fx) * tmp[:, 2 + k : 2 + k + w, :]

    # scipy mode='constant': sample coordinates outside [0, n-1] yield 0.
    # With f in [0, 1) only the leading row/col can fall outside.
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, w, 1), 1)
    out = jnp.where((rows >= fy) & (cols >= fx), out, 0.0)
    return out[..., 0] if squeeze else out


def subpixel_shift_spline(img: jax.Array, shift: jax.Array) -> jax.Array:
    """scipy.ndimage.shift(img, shift, order=3, mode='constant') in JAX.

    img: (H, W) or (H, W, C); shift: (2,).  output[i, j] = spline(img)
    evaluated at (i - dy, j - dx); 0 outside the input extent.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape
    coef = spline_prefilter(img)

    dy, dx = shift[0], shift[1]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - dy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - dx

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    fy = yy - y0
    fx = xx - x0
    yi = y0.astype(jnp.int32)
    xi = x0.astype(jnp.int32)

    wy = _bspline3_weights(fy)
    wx = _bspline3_weights(fx)

    out = 0.0
    for a in range(4):
        row = _mirror(yi + (a - 1), h)
        ry = wy[a][..., None]
        acc_x = 0.0
        for b_ in range(4):
            col = _mirror(xi + (b_ - 1), w)
            acc_x = acc_x + wx[b_][..., None] * coef[row, col]
        out = out + ry * acc_x

    inside = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
    out = jnp.where(inside[..., None], out, 0.0)
    return out[..., 0] if squeeze else out
