"""Flax layers with exact Keras/TF numerical semantics.

The reference model is a Keras graph (model/model.py:61-161); to stay
weight-compatible with its checkpoints we need three Keras behaviors that
stock Flax modules don't give us out of the box:

- ``PReLU`` with a *per-element* alpha (Keras default ``shared_axes=None``
  gives alphas shaped like the full feature map, e.g. (59, 59, 32) — see the
  checkpoint-index shape table in SURVEY.md §2 row 19).
- ``ConvTranspose2DTF``: TF's ``Conv2DTranspose`` is the gradient of a SAME
  forward conv; with stride 2 and odd kernels the implied padding is
  asymmetric, which differs from ``flax.linen.ConvTranspose``'s convention by
  a one-pixel shift.  We store the kernel in TF layout (kh, kw, out, in) and
  call ``lax.conv_transpose(..., transpose_kernel=True)``, which is exactly
  TF's computation.
- Keras ``BatchNormalization`` defaults: eps=1e-3, momentum=0.99.

Compute dtype is configurable (bfloat16 for MXU throughput); parameters stay
float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PReLU", "ConvTranspose2DTF"]


class PReLU(nn.Module):
    """Parametric ReLU with Keras-default per-element alpha (init zeros).

    f(x) = max(x, 0) + alpha * min(x, 0), alpha shaped like x without the
    batch dim (reference uses bare ``PReLU()`` throughout model/model.py).
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.zeros, x.shape[1:], jnp.float32)
        a = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class ConvTranspose2DTF(nn.Module):
    """TF-semantics transposed convolution (NHWC).

    Output spatial size is ``in * stride`` for SAME padding, matching Keras
    ``Conv2DTranspose(padding='same')`` (reference model/model.py:121-135).
    The kernel parameter keeps TF's (kh, kw, out_ch, in_ch) layout so the
    weight importer is a pure relabeling, and ``transpose_kernel=True`` makes
    the op bit-identical to TF's gradient-of-conv formulation.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=3, out_axis=2),
            (kh, kw, self.features, in_ch),
            jnp.float32,
        )
        # With transpose_kernel=True the kernel is described as the *forward*
        # conv's HWIO: our TF-layout (kh, kw, out_T, in_T) is the forward
        # kernel (kh, kw, in_fwd=out_T, out_fwd=in_T), i.e. exactly HWIO.
        y = jax.lax.conv_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=self.strides,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y
