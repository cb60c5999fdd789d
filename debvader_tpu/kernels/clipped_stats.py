"""Pallas TPU kernel: sort-free sigma-clipped background statistics.

The background mesh estimator (ops/detection.py _sigma_clipped_stats —
the TPU rebuild of sep's Background mode/rms estimation,
/root/reference/src/debvader/detect/detection.py:15-17) needs, per 64x64
mesh box: three sigma-clip iterations, each requiring the *median* and
std of the surviving subset, then final (mean, median, std).  The XLA
formulation sorts each box once (19.3 ms of the 33.7 ms fused detect core
at the 16x1024^2 production shape — the single largest remaining device
stage) and turns every iteration into prefix-sum interval statistics.

The sort only exists to answer order-statistic queries, and a median is
one rank query — answerable EXACTLY without sorting by a radix descend
over the float bit pattern: map each float to a monotonic integer key,
then walk the 32 key bits MSB->LSB, counting how many subset members fall
below the candidate prefix; 32 masked count-reductions recover the k-th
smallest element's exact bit pattern.  Sorting does O(P log P) work and,
on TPU, serializes into XLA's bitonic phases over HBM; the descend is
128 embarrassingly-lane-parallel count passes (4 selections x 32 bits)
over VMEM-resident boxes — pure VPU compare+sum at register bandwidth,
with every box in the block descending simultaneously on its own rank
target.

Key mapping (total order, matches float comparison for all finite
values): w = bits >= 0 ? bits : bits ^ 0x7fffffff  (signed int32 compare
then orders exactly like the floats; -0.0 orders below +0.0, which a
sort-based median cannot distinguish numerically).  The descend runs in
the unsigned domain u = w ^ 0x80000000 so the prefix walk starts at 0;
unsigned u-comparisons are implemented as signed w-comparisons against
T = t ^ 0x80000000.

Exactness: the selected median is bit-identical to sorting and indexing
at (count-1)//2.  The subset mean/std use direct masked reductions
centered on the unclipped mean (same conditioning trick as the XLA
path); only float summation order differs — the same divergence class
the sort-once rework documented.  Clip-interval semantics, the
empty-subset resurrection quirk (an empty clip admits |x| <= 1e-12 next
round) and zero-count outputs are pinned against the XLA formulation in
tests/test_pallas_clipped_stats.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sigma_clipped_stats_pallas"]

_SIGN = -0x80000000  # 0x80000000 bit pattern (as python int)
_BLOCK = 32  # boxes per grid step (rows x P lanes must fit VMEM with temporaries)


def _subset_stats(x, y, w, member):
    """(mean_y, med, std, count) over ``member`` lanes of each row.

    x: (B, P) f32 values; y: x centered on the row's unclipped mean;
    w: (B, P) i32 monotonic order keys; member: (B, P) bool.
    med is the exact (count-1)//2 order statistic of the member values.
    """
    m = member.astype(jnp.float32)
    n = jnp.sum(member.astype(jnp.int32), axis=-1)  # (B,)
    nf = jnp.maximum(n, 1).astype(jnp.float32)
    mean_y = jnp.sum(y * m, axis=-1) / nf
    var = jnp.maximum(jnp.sum(y * y * m, axis=-1) / nf - mean_y * mean_y, 0.0)

    k = jnp.maximum(n - 1, 0) // 2  # (B,) rank target

    # Fold the membership mask into the keys once: non-members take the
    # maximum key (INT32_MAX = the NaN bit pattern, unreachable for the
    # finite inputs), so the descend's count drops the per-step AND.
    wm = jnp.where(member, w, jnp.int32(0x7FFFFFFF))

    def bit_step(i, base):
        b = 31 - i
        t = base | jax.lax.shift_left(jnp.int32(1), b)  # unsigned prefix cand
        cless = jnp.sum(
            (wm < (t ^ jnp.int32(_SIGN))[:, None]).astype(jnp.int32), axis=-1
        )
        return jnp.where(cless <= k, t, base)

    base = jax.lax.fori_loop(0, 32, bit_step, jnp.zeros_like(k))
    wk = base ^ jnp.int32(_SIGN)
    fbits = jnp.where(wk < 0, wk ^ jnp.int32(0x7FFFFFFF), wk)
    med = jax.lax.bitcast_convert_type(fbits, jnp.float32)
    med = jnp.where(n > 0, med, 0.0)
    return mean_y, med, jnp.sqrt(var), n


def _cs_kernel(x_ref, v_ref, mean_ref, med_ref, std_ref, *, iters):
    x = x_ref[...]  # (B, P) f32
    vm = v_ref[...] > 0  # (B, P)
    n_all = jnp.sum(vm.astype(jnp.int32), axis=-1)
    c = jnp.sum(jnp.where(vm, x, 0.0), axis=-1) / jnp.maximum(n_all, 1).astype(
        jnp.float32
    )
    y = jnp.where(vm, x - c[:, None], 0.0)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    w = jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)

    member = vm
    for _ in range(iters):
        _, med, std, _ = _subset_stats(x, y, w, member)
        thr = 3.0 * std + 1e-12
        lo = (med - thr)[:, None]
        hi = (med + thr)[:, None]
        member = vm & (x >= lo) & (x <= hi)

    mean_y, med, std, n = _subset_stats(x, y, w, member)
    nonempty = n > 0
    # outputs are (1, 8, B) blocks of a (grid, 8, B) array — B rides the
    # lane dim; the 8 sublanes are replicas (Mosaic requires the trailing
    # two block dims be (8k, 128k)); the caller reads sublane 0.
    def put(ref, vec):
        ref[...] = jnp.broadcast_to(vec[None, None, :], ref.shape)

    put(mean_ref, jnp.where(nonempty, mean_y + c, 0.0))
    put(med_ref, med)
    put(std_ref, std)


@partial(jax.jit, static_argnames=("iters", "interpret", "block"))
def sigma_clipped_stats_pallas(
    boxes: jax.Array,
    valid: jax.Array | None = None,
    iters: int = 3,
    interpret: bool = False,
    block: int = _BLOCK,
):
    """Drop-in for ops/detection._sigma_clipped_stats: boxes (..., P) ->
    (mean, median, std) each shaped like boxes[..., 0].

    ``valid``: optional float/bool mask of usable pixels.  All values must
    be finite (estimate_background zero-fills non-finite pixels before
    boxing); the mask — not an inf sentinel — carries exclusion.
    """
    shape = boxes.shape[:-1]
    p = boxes.shape[-1]
    x = boxes.reshape(-1, p).astype(jnp.float32)
    v = (
        jnp.ones_like(x)
        if valid is None
        else valid.reshape(-1, p).astype(jnp.float32)
    )
    n = x.shape[0]
    grid = pl.cdiv(n, block)
    n_pad = grid * block
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        v = jnp.pad(v, ((0, n_pad - n), (0, 0)))

    in_spec = pl.BlockSpec((block, p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 8, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    mean, med, std = pl.pallas_call(
        partial(_cs_kernel, iters=iters),
        out_shape=tuple(
            jax.ShapeDtypeStruct((grid, 8, block), jnp.float32) for _ in range(3)
        ),
        grid=(grid,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec, out_spec),
        interpret=interpret,
    )(x, v)

    def unpack(o):
        return o[:, 0, :].reshape(n_pad)[:n].reshape(shape)

    return unpack(mean), unpack(med), unpack(std)
