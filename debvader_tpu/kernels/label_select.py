"""Pallas TPU kernel: K direction-coded label-resolution steps per pass.

Detection's watershed labels resolve by iterating ``cur[p] <-
cur[parent[p]]`` where ``parent`` is one of the 9 neighbors
(ops/detection.py); expressed as a 9-way select over shifted copies of
``cur``.  The XLA loop pays a full HBM round trip plus a convergence
reduction per single step (measured r2: ~2 ms per (16, 1024, 1024)
iteration, ~300 ms to the fixpoint); this kernel advances K steps per
``pallas_call`` inside VMEM — each program reads a K-halo'd ``cur`` block
and direction block once, iterates K roll+select sweeps locally, and
writes the stepped center block.  Convergence is checked only between
K-step chunks, so the fixpoint costs ~ceil(L / K) HBM passes instead of L.

The batch of detection tiles is flattened into the row axis: ascent
parents never point outside their own tile (outside neighbors carry -inf
in the parent race), so halo rows read across a tile boundary are never
consumed.  Positions beyond the field carry direction code 4 (self), so
halo garbage cannot propagate inward past the K-ring the center never
reads.

Used by ops/detection.py on TPU (``DetectionConfig.use_pallas_select``,
default on); step parity and fixpoint equality with the gather resolution
are asserted in tests/test_pallas_detection.py.

Measured on v5e at the production shape (16 tiles x 1024^2, the 4k-coadd
detection workload): full detect core 72.3 ms with this kernel vs
102.6 ms with the XLA select loop (1.42x; the resolution stage itself is
~3.5x), labels bit-identical.  The r1 gather-based pointer jumping cost
1616 ms on the same workload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["label_select_step", "label_select_fixpoint"]

_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _roll2(x, dy, dx):
    out = x
    if dy:
        out = pltpu.roll(out, (-dy) % out.shape[0], 0)
    if dx:
        out = pltpu.roll(out, (-dx) % out.shape[1], 1)
    return out


def _select_kernel(cur_ref, dir_ref, out_ref, *, rows, width, steps, lead_r, lead_c):
    acc = cur_ref[:, :]
    d = dir_ref[:, :]
    for _ in range(steps):
        nxt = acc
        for code, (dy, dx) in enumerate(_OFFSETS):
            if dy == 0 and dx == 0:
                continue
            # shifted[p] = acc[p + (dy, dx)]; wrap garbage stays within
            # `steps` of the block edge, which the center never reads.
            nxt = jnp.where(d == code, _roll2(acc, dy, dx), nxt)
        acc = nxt
    out_ref[:, :] = acc[lead_r : lead_r + rows, lead_c : lead_c + width]


@partial(jax.jit, static_argnames=("rows", "steps", "interpret"))
def label_select_step(
    cur: jax.Array,
    dir_code: jax.Array,
    rows: int = 128,
    steps: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Advance the resolution ``steps`` ancestor steps over an (H, W) field.

    cur: (H, W) int32 flat-parent labels; dir_code: (H, W) int32 in 0..8
    (4 = self).  H must be a multiple of ``rows``; W a multiple of 128.
    Positions outside the real field must carry dir_code 4.
    """
    h, w = cur.shape
    grid_n = pl.cdiv(h, rows)
    # K-px logical halo widened to Mosaic's (8, 128) alignment.
    lead_r = steps
    halo_r = -(-2 * steps // 8) * 8
    lead_c = steps
    halo_c = -(-2 * steps // 128) * 128
    cur_p = jnp.pad(cur, ((lead_r, halo_r - lead_r), (lead_c, halo_c - lead_c)))
    # halo dir positions: self (4) so labels there stay put
    dir_p = jnp.pad(
        dir_code,
        ((lead_r, halo_r - lead_r), (lead_c, halo_c - lead_c)),
        constant_values=4,
    )

    halo_spec = pl.BlockSpec(
        (pl.Element(rows + halo_r), pl.Element(w + halo_c)),
        lambda i: (i * rows, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        partial(
            _select_kernel,
            rows=rows,
            width=w,
            steps=steps,
            lead_r=lead_r,
            lead_c=lead_c,
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), cur.dtype),
        grid=(grid_n,),
        in_specs=[halo_spec, halo_spec],
        out_specs=pl.BlockSpec(
            (rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(cur_p, dir_p)


def label_select_fixpoint(
    cur0: jax.Array,
    dir_code: jax.Array,
    rows: int = 128,
    steps: int = 4,
    interpret: bool = False,
):
    """Iterate K-step kernel chunks to the label fixpoint.

    Terminates by construction: real ascent forests are acyclic (strict
    (value, -index) order along every parent edge), so the longest path is
    finite and every chunk advances all unresolved pixels K ancestors.
    Returns (labels, n_chunks).

    steps=4 default from a hardware sweep at the production 16x1024^2
    shape (scripts/sweep_label_steps.py): ascent paths are short (source
    radius scale), so small chunks waste less compute past the fixpoint —
    K=4 resolves in 4 chunks at 56 ms vs K=16's 2 chunks at 109 ms; the
    per-chunk convergence reduction is cheap next to the 8-way select
    sweeps, and rows=256 blocks exceed the 16 MB scoped VMEM.  Long-path
    workloads degrade gracefully (chunk count grows by ceil(L/4), each
    chunk ~14 ms at this shape).
    """
    step = lambda c: label_select_step(
        c, dir_code, rows=rows, steps=steps, interpret=interpret
    )

    def cond(state):
        cur, nxt, it = state
        return jnp.any(cur != nxt)

    def body(state):
        _, nxt, it = state
        return nxt, step(nxt), it + 1

    cur, nxt, it = jax.lax.while_loop(
        cond, body, (cur0, step(cur0), jnp.int32(1))
    )
    return nxt, it
