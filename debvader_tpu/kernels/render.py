"""Pallas TPU kernel: fused subpixel-shift + scatter-add field rendering.

The XLA path (ops/shift.render_field) renders sources with a sequential
``lax.scan`` of dynamic-update-slices — correct, but serialized over sources
and bounced through HBM once per source.  This kernel inverts the loop
structure the TPU-native way:

- the *grid* runs over field tiles (each program owns one (TILE, TILE, B)
  block of the output, resident in VMEM);
- inside, a ``fori_loop`` walks all sources, and ``@pl.when`` skips sources
  whose stamp cannot overlap the tile;
- each overlapping stamp is bilinearly shifted by its fractional offset and
  accumulated into the tile block directly in VMEM — no HBM round-trips,
  and tiles are embarrassingly parallel.

The stamp batch is small ((N, S, S, B) float32; 256 sources of 59x59x6 is
~20 MB in HBM, gathered per tile), so the kernel is bandwidth-friendly:
output traffic is exactly one write of the field.

Numerics match ops/shift.render_field (same bilinear taps, same
scipy-order-1 'constant' border rule) to float32 epsilon — asserted in
tests/test_pallas_render.py (interpreter mode).

STATUS: experimental.  Mosaic currently scalarizes the dynamic 2D gathers
this kernel needs for runtime-positioned taps, making the TPU lowering
orders of magnitude slower than the XLA scan renderer — so the production
path (ops/shift.render_field) keeps the scan, whose per-source
dynamic-update-slices are cheap (~90 KB r/w per source) and fuse well.
Revisit when Mosaic grows vectorized gather support; the tile-parallel
structure here is the right shape for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["render_field_pallas"]


def _render_kernel(stamps_ref, offsets_ref, mask_ref, out_ref, *, field_size, tile):
    """One program renders one (tile, tile, B) block of the field."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    n, s, _, b = stamps_ref.shape
    pos0 = (field_size - s) // 2  # centered placement

    y0_tile = ty * tile
    x0_tile = tx * tile

    acc0 = jnp.zeros((tile, tile, b), jnp.float32)

    # Per-pixel global coordinates of this tile.
    gy = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0) + y0_tile
    gx = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1) + x0_tile

    def body(i, acc):
        off_y = offsets_ref[i, 0]
        off_x = offsets_ref[i, 1]
        m = mask_ref[i, 0]

        # Stamp pixel (p, q) lands at field position (pos0 + off + (p, q)).
        # For each tile pixel, the source-stamp coordinate is:
        sy = gy - (pos0 + off_y)
        sx = gx - (pos0 + off_x)

        # Overlap test for the whole tile (scalar): the stamp spans
        # [pos0 + off, pos0 + off + s) in field coords.
        lo_y = pos0 + off_y
        lo_x = pos0 + off_x
        # (widened by 1 px: fractional shifts move flux up to one pixel
        # past the stamp, matching the XLA path's padded-stamp shift)
        overlaps = (
            (lo_y - 1 < y0_tile + tile)
            & (lo_y + s + 1 > y0_tile)
            & (lo_x - 1 < x0_tile + tile)
            & (lo_x + s + 1 > x0_tile)
            & (m > 0)
        )

        def add_stamp(acc):
            y0 = jnp.floor(sy)
            x0 = jnp.floor(sx)
            fy = sy - y0
            fx = sx - x0
            yi = y0.astype(jnp.int32)
            xi = x0.astype(jnp.int32)

            # scipy 'constant' border rule applied on the *padded* stamp
            # (the XLA path zero-pads by 1 before shifting, ops/shift.py),
            # so the valid sample extent is [-1, s] in stamp coordinates.
            inside_ext = (sy >= -1) & (sy <= s) & (sx >= -1) & (sx <= s)

            # Mosaic lowers only 2D gathers: unroll the (static, small) band
            # axis and gather each band's (tile, tile) taps separately.
            bands = []
            for c in range(b):
                stamp2d = stamps_ref[i, :, :, c]  # (S, S) in VMEM

                def tap(dy, dx):
                    yy = yi + dy
                    xx = xi + dx
                    inside = (yy >= 0) & (yy < s) & (xx >= 0) & (xx < s)
                    v = stamp2d[jnp.clip(yy, 0, s - 1), jnp.clip(xx, 0, s - 1)]
                    return jnp.where(inside, v, 0.0)

                contrib = (
                    tap(0, 0) * (1 - fy) * (1 - fx)
                    + tap(0, 1) * (1 - fy) * fx
                    + tap(1, 0) * fy * (1 - fx)
                    + tap(1, 1) * fy * fx
                )
                bands.append(jnp.where(inside_ext, contrib, 0.0))
            return acc + jnp.stack(bands, axis=-1)

        return jax.lax.cond(overlaps, add_stamp, lambda a: a, acc)

    acc = jax.lax.fori_loop(0, n, body, acc0)
    out_ref[:, :, :] = acc


@partial(jax.jit, static_argnames=("field_size", "tile", "interpret"))
def render_field_pallas(
    stamps: jax.Array,
    offsets: jax.Array,
    field_size: int,
    mask: jax.Array | None = None,
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops/shift.render_field, grid-over-tiles in Pallas.

    stamps (N, S, S, B) float32; offsets (N, 2) float; mask optional (N,).
    """
    stamps = stamps.astype(jnp.float32)
    n, s, _, b = stamps.shape
    if mask is None:
        mask = jnp.ones((n,), jnp.float32)
    mask = mask.astype(jnp.float32).reshape(n, 1)
    offsets = offsets.astype(jnp.float32)

    grid = (pl.cdiv(field_size, tile), pl.cdiv(field_size, tile))
    padded = grid[0] * tile

    out = pl.pallas_call(
        partial(_render_kernel, field_size=field_size, tile=tile),
        out_shape=jax.ShapeDtypeStruct((padded, padded, b), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, s, s, b), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile, b), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(stamps, offsets, mask)
    return out[:field_size, :field_size, :]
