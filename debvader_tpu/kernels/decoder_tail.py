"""Pallas TPU kernel: fused decoder tail (ConvT-s1 + PReLU + Conv + ReLU).

The decoder's final stages operate on the largest activation maps
(batch x 64 x 64 x 32): the stride-1 ConvTranspose, its per-element PReLU,
and the 2*bands output conv (models/vae.py Decoder, reference
model/model.py:129-137).  Unfused, the intermediate 64^2 x 32 map makes a
full HBM round trip (~2.1 GB read+write at batch 4096); this kernel keeps it
in VMEM:

- grid over batch blocks; each program owns (nb, 66, 66, 32) halo'd input
  (the stride-1 ConvT needs a 1-px halo);
- the ConvT is computed as 9 static-slice matmuls with the spatially
  flipped kernel (convT(s=1) == conv with flipped taps; kernel stored in
  TF (kh, kw, out, in) layout like models/layers.ConvTranspose2DTF);
- bias + per-element PReLU apply in registers; the conv-SAME zero ring is
  added in VMEM; 9 more tap-matmuls produce the 2*bands output + ReLU.

All matmuls run with float32 accumulation (preferred_element_type), inputs
in the model's compute dtype.  Parity with the XLA op chain is asserted in
tests/test_pallas_decoder_tail.py.

STATUS: experimental.  Measured on v5e at the production shape
(4096 x 64 x 64 x 32 -> 12): the unrolled 18-tap accumulation keeps enough
live VMEM temporaries that batch blocks nb >= 2 exceed the 16 MB scoped
limit, and nb = 1 amortizes nothing (weights + alphas re-staged per
program; 4.3 s vs XLA's ~10 ms runtime).  XLA's fusion of this chain is
within ~2-3 ms of the theoretical traffic floor, so the production decoder
keeps the XLA path.  A viable kernel needs spatial tiling + fori_loop tap
accumulation + weight reuse across grid steps (dimension_semantics
"arbitrary" batch axis) — round-2 material; the math and parity tests here
are the foundation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_decoder_tail", "decoder_tail_reference"]


def _tail_kernel(x_ref, k2_ref, b2_ref, a2_ref, k3_ref, b3_ref, out_ref, *, nb, size):
    """x block (nb, size+2, size+2, C); out block (nb, size, size, O)."""
    c = x_ref.shape[-1]
    o = out_ref.shape[-1]

    # ---- ConvT stride-1: h[p] = sum_s x[p+s-1] . k2[2-sy, 2-sx, :, :]
    # (k2 TF layout (kh, kw, out, in): contract over the last axis = in)
    h = jnp.zeros((nb, size, size, c), jnp.float32)
    for sy in range(3):
        for sx in range(3):
            xs = x_ref[:, sy : sy + size, sx : sx + size, :]
            w = k2_ref[2 - sy, 2 - sx, :, :]  # (out, in)
            h = h + jax.lax.dot_general(
                xs, w,
                dimension_numbers=(((3,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    h = h + b2_ref[0][None, None, None, :]
    alpha = a2_ref[:, :, :]
    h = jnp.maximum(h, 0.0) + alpha[None] * jnp.minimum(h, 0.0)
    h = h.astype(x_ref.dtype)

    # ---- SAME conv to 2*bands channels + ReLU, zero ring around h
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((nb, size, size, o), jnp.float32)
    for ty in range(3):
        for tx in range(3):
            hs = hp[:, ty : ty + size, tx : tx + size, :]
            w = k3_ref[ty, tx, :, :]  # (in, out)
            acc = acc + jax.lax.dot_general(
                hs, w,
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b3_ref[0][None, None, None, :]
    out_ref[:, :, :, :] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)


def fused_decoder_tail(
    x: jax.Array,
    k2: jax.Array,
    b2: jax.Array,
    a2: jax.Array,
    k3: jax.Array,
    b3: jax.Array,
    nb: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """x (N, S, S, C) -> (N, S, S, O) with O = k3.shape[-1].

    k2: (3, 3, C, C) TF convT layout (out, in); b2: (C,); a2: (S, S, C)
    PReLU alphas; k3: (3, 3, C, O) HWIO; b3: (O,).
    """
    n, size, _, c = x.shape
    o = k3.shape[-1]
    if n % nb:
        raise ValueError(f"batch {n} must be a multiple of nb={nb}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    return pl.pallas_call(
        partial(_tail_kernel, nb=nb, size=size),
        out_shape=jax.ShapeDtypeStruct((n, size, size, o), x.dtype),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec(
                (nb, size + 2, size + 2, c), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((size, size, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, o), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, size, size, o), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        xp,
        k2.astype(x.dtype),
        b2.reshape(1, -1).astype(jnp.float32),
        a2.astype(jnp.float32),
        k3.astype(x.dtype),
        b3.reshape(1, -1).astype(jnp.float32),
    )


def decoder_tail_reference(x, k2, b2, a2, k3, b3):
    """The exact XLA op chain the kernel replaces (for parity tests and
    speed comparison): ConvTranspose2DTF(s=1) + bias, per-element PReLU,
    SAME conv + bias, ReLU."""
    y = jax.lax.conv_transpose(
        x, k2.astype(x.dtype), strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    ) + b2.astype(x.dtype)
    y = jnp.maximum(y, 0) + a2.astype(y.dtype)[None] * jnp.minimum(y, 0)
    z = jax.lax.conv_general_dilated(
        y, k3.astype(y.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b3.astype(y.dtype)
    return jnp.maximum(z, 0)
