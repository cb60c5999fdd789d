"""Subpixel shifts and batched field assembly.

The reference assembles residual/predicted fields by zero-padding every
59x59 stamp to full field size and calling ``scipy.ndimage.shift`` per source
per band (deblend/field_deblender.py:92-94,160-182) — O(sources x bands) full
-field spline interpolations on the host.  TPU-native replacement:

- the *fractional* part of each shift is applied to the small stamp itself
  (bilinear gather, O(cutout^2));
- the *integer* part becomes the placement offset of a dynamic-update-slice
  scatter-add into the field canvas;
- all sources render in one ``lax.scan`` inside a single jit, so residual
  assembly is one device pass regardless of source count.

Interpolation is bilinear (scipy order=1) rather than the reference's
default cubic spline (order=3); SURVEY.md §7 hard-part (c) documents this
choice — for the band-limited, PSF-smoothed stamps the VAE emits, the
difference is far below the model's own uncertainty (validated in
tests/test_shift.py against scipy order=3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "subpixel_shift",
    "subpixel_shift_const",
    "render_field",
    "render_pad",
    "shift_full",
]


def render_pad(stamp_size: int, order: int = 1) -> int:
    """Canvas padding render_field uses for (stamp_size, order) — exposed so
    incremental callers (crop=False) can crop the final canvas themselves:
    ``canvas[pad : pad + field_size, pad : pad + field_size]``."""
    if order not in (1, 3):
        # mirror render_field's validation so a caller cannot compute a
        # crop offset for a render that will never run
        raise ValueError(f"render interpolation order must be 1 or 3, got {order}")
    interp_pad = 1 if order == 1 else 10
    return stamp_size + 2 * interp_pad


def subpixel_shift_const(img: jax.Array, shift: jax.Array) -> jax.Array:
    """``subpixel_shift`` specialized to constant per-image shifts with
    fractional parts in [0, 1): gather-free — two shifted slices per axis
    with scalar weights (f, 1 - f), zero padding for the boundary.  This is
    what the field renderer calls after splitting integer offsets; the
    generic path's per-pixel clip-gathers dominate on TPU."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape
    fy, fx = shift[0], shift[1]
    p = jnp.pad(img, ((1, 0), (1, 0), (0, 0)))
    tmp = fy * p[0:h, :, :] + (1.0 - fy) * p[1 : 1 + h, :, :]
    out = fx * tmp[:, 0:w, :] + (1.0 - fx) * tmp[:, 1 : 1 + w, :]
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, w, 1), 1)
    out = jnp.where((rows >= fy) & (cols >= fx), out, 0.0)
    return out[..., 0] if squeeze else out


def subpixel_shift(img: jax.Array, shift: jax.Array) -> jax.Array:
    """Bilinear equivalent of scipy.ndimage.shift(img, (dy, dx), order=1).

    img: (H, W) or (H, W, C); shift: (2,) float.  output[i, j] =
    img[i - dy, j - dx] with zeros outside the support.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape
    dy, dx = shift[0], shift[1]

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - dy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - dx

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    fy = (yy - y0)[..., None]
    fx = (xx - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside[..., None], v, 0.0)

    out = (
        tap(y0, x0) * (1 - fy) * (1 - fx)
        + tap(y0, x0 + 1) * (1 - fy) * fx
        + tap(y0 + 1, x0) * fy * (1 - fx)
        + tap(y0 + 1, x0 + 1) * fy * fx
    )
    # scipy mode='constant' semantics: a sample coordinate outside the input
    # extent yields cval outright (no partial blending at the border).
    inside = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
    out = jnp.where(inside[..., None], out, 0.0)
    return out[..., 0] if squeeze else out


def shift_full(img: jax.Array, shift: jax.Array) -> jax.Array:
    """Full-image bilinear shift (drop-in for the reference's per-band
    scipy.ndimage.shift on padded canvases)."""
    return subpixel_shift(img, shift)


@partial(
    jax.jit,
    static_argnames=("field_size", "order", "chunk", "crop"),
    donate_argnames=("canvas",),
)
def render_field(
    stamps: jax.Array,
    offsets: jax.Array,
    field_size: int | tuple[int, int],
    mask: jax.Array | None = None,
    order: int = 1,
    chunk: int = 1024,
    canvas: jax.Array | None = None,
    crop: bool = True,
) -> jax.Array:
    """Sum of all stamps placed at (center + offset) in a field canvas.

    stamps: (N, S, S, B); offsets: (N, 2) float — the reference's
    (galaxy_distance_to_center + optimized_shift), i.e. the stamp is moved by
    ``offset`` relative to being centered in the field
    (field_deblender.py:69-94).  mask: optional (N,) bool — masked-out
    sources contribute nothing (replaces the reference's passed_cuts
    filtering).  order: 1 = bilinear (fast default) or 3 = cubic B-spline,
    matching the reference's scipy.ndimage.shift order=3; the stamp is
    zero-padded far enough (10 px, pole decay 0.27^10 ~ 2e-6) that the
    local prefilter equals the reference's whole-canvas prefilter.

    The fractional interpolation (spline prefilter + 16 taps — the
    expensive part) runs vmapped over ``chunk`` sources at a time, so its
    recursive filters process (chunk, S, B) vectors per step instead of one
    source's (S, B); only the trivially cheap patch scatter stays
    sequential in the scan.  ``chunk`` bounds peak memory at
    chunk * (S + 2*pad)^2 * B floats.

    ``canvas``/``crop`` support incremental survey-scale rendering: pass
    ``crop=False`` to get the padded accumulation canvas back, feed it to
    the next call's ``canvas``, and crop the final one with ``render_pad``
    (this is how deblend_and_render assembles a residual for more sources
    than fit on device at once, without a host round trip per chunk).
    The passed ``canvas`` is DONATED (consumed): the accumulation happens
    in the same device buffer, so chunked rendering holds one canvas, not
    two — at 12k x 12k x 6 the functional copy was 3.7 GB per chunk and
    tipped the 16 GB chip over.  Keep only the returned array.

    ``field_size`` may be an ``(fy, fx)`` tuple for rectangular canvases
    (the sharded serving path renders into row bands); offsets keep the
    centered-placement convention per axis.

    Returns (field_size, field_size, B), or the padded canvas if crop=False.
    """
    n, s, _, b = stamps.shape
    fy, fx = (
        (field_size, field_size)
        if isinstance(field_size, int)
        else field_size
    )
    # centered placement per axis (field_deblender.py:72)
    pos0y = (fy - s) // 2
    pos0x = (fx - s) // 2

    if order == 1:
        interp_pad, interp = 1, subpixel_shift_const
    elif order == 3:
        from debvader_tpu.ops.spline import subpixel_shift_spline_const

        interp_pad, interp = 10, subpixel_shift_spline_const
    else:
        raise ValueError(f"unsupported interpolation order {order}")

    pad_s = s + 2 * interp_pad
    # Canvas padded so any clipped placement stays in bounds.
    pad = pad_s
    canvas_y = fy + 2 * pad
    canvas_x = fx + 2 * pad

    if mask is None:
        mask = jnp.ones((n,), bool)

    # Pad the source axis to a whole number of chunks (padded rows masked).
    chunk = min(chunk, n) if n else 1
    n_pad = (-n) % chunk
    if n_pad:
        stamps = jnp.concatenate(
            [stamps, jnp.zeros((n_pad, s, s, b), stamps.dtype)]
        )
        offsets = jnp.concatenate(
            [offsets, jnp.zeros((n_pad, 2), offsets.dtype)]
        )
        mask = jnp.concatenate([mask, jnp.zeros((n_pad,), bool)])

    int_off = jnp.floor(offsets).astype(jnp.int32)
    frac = (offsets - int_off).astype(jnp.float32)

    def scatter_body(canvas, inputs):
        shifted, ioff, m = inputs
        yu = pos0y + ioff[0] - interp_pad + pad
        xu = pos0x + ioff[1] - interp_pad + pad
        y = jnp.clip(yu, 0, canvas_y - pad_s)
        x = jnp.clip(xu, 0, canvas_x - pad_s)
        # With pad = pad_s any placement that overlaps the field at all is
        # unclipped; clipping only fires for stamps entirely outside the
        # padded canvas, which must contribute nothing (not wrap).
        visible = m & (yu == y) & (xu == x)
        shifted = jnp.where(visible, shifted, 0.0)
        patch = jax.lax.dynamic_slice(canvas, (y, x, 0), (pad_s, pad_s, b))
        canvas = jax.lax.dynamic_update_slice(canvas, patch + shifted, (y, x, 0))
        return canvas, None

    def shift_one(stamp, f):
        stamp_p = jnp.pad(
            stamp, ((interp_pad, interp_pad), (interp_pad, interp_pad), (0, 0))
        )
        return interp(stamp_p, f)

    if canvas is None:
        canvas = jnp.zeros((canvas_y, canvas_x, b), stamps.dtype)
    total = stamps.shape[0]
    for c0 in range(0, total, chunk):
        sl = slice(c0, c0 + chunk)
        # Interpolation always runs in float32 (the spline prefilter's
        # recursive scans carry float32 state); the shifted patches cast
        # to the canvas dtype at the scatter, so reduced-precision
        # canvases (DeblendField device_dtype) compose with any order.
        shifted = jax.vmap(shift_one)(
            stamps[sl].astype(jnp.float32), frac[sl]
        ).astype(canvas.dtype)
        canvas, _ = jax.lax.scan(
            scatter_body, canvas, (shifted, int_off[sl], mask[sl])
        )
    if not crop:
        return canvas
    return canvas[pad : pad + fy, pad : pad + fx, :]
