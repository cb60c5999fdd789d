"""Pallas TPU kernel: fused decoder-tail conv pair at fidelity precision.

The serving decoder's tail — stride-1 3x3 convs at 59-64px resolution with
12-64 channels — dominates the fidelity mode's cost for two reasons the
XLA path cannot fix together (measured, BASELINE.md r4):

1. **Layer-boundary bandwidth**: every layer round-trips a
   (B, 64, 64, 32) float32 activation map (~2.1 GB at batch 4096) through
   HBM; a standalone tail conv is bandwidth-bound (~7.2 ms vs its ~1.4 ms
   of 1-pass MXU time).
2. **Lane starvation + pass multiplication**: fidelity arithmetic needs
   >=3 MXU passes per layer (no layer tolerates 1-pass DEFAULT), and each
   pass wastes >=3/4 of the 128 output lanes at C_out <= 32.

This kernel computes ``relu(conv2(prelu(conv1(x) + b1)) + b2)`` — the
ConvT_7 + PReLU + band-conv chain (models/vae.py Decoder tail; reference
model/model.py:130-148) — in ONE pass over x:

- the intermediate activation never touches HBM (one read of x, one write
  of the 12-channel output);
- both convs run as im2col matmuls with round-to-nearest bf16-limb
  3-term products (models/precision.py 'bf16x3' — ~10x less error than
  XLA's truncation-based HIGH at equal pass count), the w-limbs
  concatenated along output channels so both limb products of the hi
  activation ride one MXU contraction's lanes;
- PReLU (per-element alpha) and the biases fuse into the chain on the VPU.

Per 16-row tile the MXU does ~4 lane-slot passes where the XLA HIGH chain
does 6, and HBM traffic drops ~2x.

STATUS (round 5): RETIRED as a throughput project on this hardware, with
the lowering walls resolved and the economics measured — the kernel stays
correctness-complete in interpreter mode
(tests/test_pallas_tail_fused.py, ~1e-5 parity incl. the off-image
h1-halo zeroing chained SAME convs require).

The round-4 walls, re-probed in r5 (scripts/probe_mosaic_tail*.py,
results/mosaic_probes*.json):

1. HBM 128-lane padding of small-channel trailing dims — avoidable (flat
   (B, H, W*C) layouts; 4-pixel lane packing (B, H*W/4, 128)).
2. The lane-splitting im2col reshape — the sublane-side workaround
   COMPILES: lane-rolls + stack + (R,4,128)->(4R,128) sublane reshape
   lower and run (probe `unpack_roll_stack_reshape`), as do narrow
   lane-slice STORES into VMEM scratch (`scratch_narrow_store_kbuild`).
   (Narrow lane-piece CONCATs crash the Mosaic compiler — use scratch
   stores.)

So a compiled kernel is now buildable — and not worth building, for a
measured reason stronger than any lowering wall:

- Exec-slot coverage: with c_in=c_out=32 (and 12 for the band head), a
  3-term limb conv has a structural MXU-utilization ceiling of 34-56%
  across every lowerable matmul formulation (pixels-in-M with K/N piece
  packing; channels-in-sublanes transposed; 4-px-packed block-banded) —
  the (tap, limb-term) coverage grid times the 32-lane piece padding.
- The WHOLE fidelity forward sustains ~58 T bf16-pass-equivalents/s —
  66% of the ~87 T the best dense HIGH gemm reaches on this chip
  (docs/ROOFLINE.md §2-3, scripts/bench_gemm_ceiling.py).  The 34% gap
  lives exactly in the stages this kernel targets, and the coverage
  ceiling above (34-56%) is BELOW the share XLA already achieves there —
  a fused tail cannot beat the emitter it would replace, and the prize
  the r4 STATUS quantified here (a ~20% end-to-end win from a 24.85 ms
  chain arm) does not exist at the chip's true constants: that arm
  re-measures ~2x slower in ordinary tunnel windows, and the model-wide
  sustained-rate accounting supersedes single-chain arms entirely.

The >=1e5 + <=1e-4 joint clause this kernel was meant to close is
settled in docs/ROOFLINE.md: MET on the literal 45x45x6 north-star
workload (102.7k measured), closed-form impossible for 59x59x6 on v5e
(it would need >100% of the chip's theoretical peak at the proven
3-pass floor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_tail_pair", "fused_tail_pair_reference"]


def _rne(x):
    """Round-to-nearest-even bf16 value of x, in float32, via integer bit
    arithmetic (lax.reduce_precision has no Pallas TPU lowering; an astype
    round-trip risks the excess-precision convert folding).  Adding
    0x7FFF + round-bit to the mantissa implements ties-to-even, with
    mantissa carry correctly bumping the exponent; inputs are finite
    activations (the serving guard zeroes non-finite pixels)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    rb = jnp.bitwise_and(jax.lax.shift_right_logical(bits, 16), 1)
    r = jnp.bitwise_and(bits + jnp.int32(0x7FFF) + rb, jnp.int32(-65536))
    return jax.lax.bitcast_convert_type(r, jnp.float32)


def _split2(x):
    """Two RNE bf16 limbs of a float32 array."""
    h = _rne(x)
    return h.astype(jnp.bfloat16), (x - h).astype(jnp.bfloat16)


def _im2col(x, rows, width, c):
    """x: (rows + 2, (width + 2) * c) flat-W*C VMEM array -> (rows * width,
    9c) patches, tap-major then channel (matmul K axis order must match the
    packed kernels below).  The W*C flattening keeps every array's lane
    dimension large and 128-aligned — with a bare trailing channel dim of
    12-64, Mosaic pads HBM storage to 128 lanes, a 2-10x footprint blowup
    that OOM'd the first formulation."""
    slabs = []
    for dy in range(3):
        for dx in range(3):
            slab = x[dy : dy + rows, dx * c : (dx + width) * c]
            slabs.append(slab.reshape(rows * width, c))
    return jnp.concatenate(slabs, axis=-1)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _limb3(p, w_hi_cat, w_hi, n_out):
    """3-term RNE limb product: ph @ [wh|wm] (lane-packed) + pm @ wh."""
    ph, pm = _split2(p)
    y2 = _mm(ph, w_hi_cat)  # (M, 2 * n_out)
    y = y2[:, :n_out] + y2[:, n_out:] + _mm(pm, w_hi)
    return y


def _kernel(
    x_ref, a1_ref, w1c_ref, w1h_ref, b1_ref, w2c_ref, w2h_ref, b2_ref,
    out_ref, *, tile, width, cin, c1, c2, h_img,
):
    """One (batch, row-tile) program.  All activation refs use the flat
    (rows, W * C) layout (see _im2col).

    x_ref: (1, tile + 4, (width + 4) * cin) halo'd input rows
    a1_ref: (1, tile + 2, (width + 2) * c1) halo'd PReLU alphas
    out_ref: (1, tile, width * c2)
    """
    rows1 = tile + 2  # conv1 output rows incl. conv2's halo
    w1_ = width + 2  # conv1 output cols incl. conv2's halo
    # blocks over-read to the 8-sublane alignment; use the leading rows
    x = x_ref[0][: rows1 + 2]
    p1 = _im2col(x, rows1, w1_, cin)
    h1 = _limb3(p1, w1c_ref[:, :], w1h_ref[:, :], c1)
    h1 = h1 + b1_ref[:, :]
    a1 = a1_ref[0][:rows1, : w1_ * c1].reshape(rows1 * w1_, c1)
    h1 = jnp.maximum(h1, 0.0) + a1 * jnp.minimum(h1, 0.0)
    # conv2's SAME padding must see ZEROS outside the image, but the fused
    # chain computes real conv1 values in the halo (its taps read image
    # pixels).  Zero the h1 rows/cols whose global position is off-image.
    i = pl.program_id(1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows1, w1_), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows1, w1_), 1) - 1
    grow = i * tile - 1 + pos
    ok = (grow >= 0) & (grow < h_img) & (col >= 0) & (col < width)
    h1 = jnp.where(ok.reshape(rows1 * w1_, 1), h1, 0.0)
    p2 = _im2col(h1.reshape(rows1, w1_ * c1), tile, width, c1)
    h2 = _limb3(p2, w2c_ref[:, :], w2h_ref[:, :], c2)
    h2 = jnp.maximum(h2 + b2_ref[:, :], 0.0)
    out_ref[0] = h2.reshape(tile, width * c2)


def _pack(w):
    """(3, 3, cin, cout) HWIO -> K-major (9 cin, cout) hi/lo bf16 pieces,
    tap-major K order matching _im2col."""
    kh, kw, cin, cout = w.shape
    flat = jnp.asarray(w, jnp.float32).reshape(kh * kw * cin, cout)
    hi, lo = _split2(flat)
    return jnp.concatenate([hi, lo], axis=1), hi  # (K, 2cout), (K, cout)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_tail_pair(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    alpha1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """relu(conv2(prelu(conv1(x) + b1, alpha1)) + b2) in one fused pass.

    x: (B, H, W, c_in) float32; w1: (3, 3, c_in, c1) HWIO; alpha1:
    (H, W, c1) per-element PReLU alpha; w2: (3, 3, c1, c2).  Both convs
    are SAME/stride-1.  Returns (B, H, W, c2) float32.
    """
    b, h, w, cin = x.shape
    c1 = w1.shape[-1]
    c2 = w2.shape[-1]
    grid_h = pl.cdiv(h, tile)
    hp = grid_h * tile
    # conv halo 2 rows/cols total each side (two chained 3x3s); activations
    # travel in the flat (rows, W * C) layout (lane-dim alignment — see
    # _im2col).  Row padding is widened so the 8-sublane-aligned over-read
    # blocks below stay in bounds; alpha's W padding is widened to (1, 3)
    # so its flat lane width (w + 4) * c1 is 128-divisible like x's.
    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (2, hp - h + 6), (2, 2), (0, 0))
    ).reshape(b, hp + 8, (w + 4) * cin)
    a1p = jnp.pad(
        alpha1.astype(jnp.float32), ((1, hp - h + 7), (1, 3), (0, 0))
    ).reshape(1, hp + 8, (w + 4) * c1)
    w1c, w1h = _pack(w1)
    w2c, w2h = _pack(w2)
    b1r = jnp.asarray(b1, jnp.float32).reshape(1, c1)
    b2r = jnp.asarray(b2, jnp.float32).reshape(1, c2)

    out = pl.pallas_call(
        partial(_kernel, tile=tile, width=w, cin=cin, c1=c1, c2=c2, h_img=h),
        out_shape=jax.ShapeDtypeStruct((b, hp, w * c2), jnp.float32),
        grid=(b, grid_h),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(tile + 8), pl.Element((w + 4) * cin)),
                lambda bi, i: (bi, i * tile, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (pl.Element(1), pl.Element(tile + 8), pl.Element((w + 4) * c1)),
                lambda bi, i: (0, i * tile, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1h
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2h
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec(
            (1, tile, w * c2), lambda bi, i: (bi, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(xp, a1p, w1c, w1h, b1r, w2c, w2h, b2r)
    return out[:, :h].reshape(b, h, w, c2)


def fused_tail_pair_reference(x, w1, b1, alpha1, w2, b2, precision=None):
    """XLA reference of the same chain (for parity tests and the
    benchmark's comparison arm)."""

    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        )

    h1 = conv(x.astype(jnp.float32), w1) + b1
    h1 = jnp.maximum(h1, 0.0) + alpha1 * jnp.minimum(h1, 0.0)
    return jnp.maximum(conv(h1, w2) + b2, 0.0)
