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

__all__ = [
    "PReLU",
    "ConvTranspose2DTF",
    "SubpixelConv2D",
    "pack_subpixel_kernel",
    "pack_subpixel_kernel_s1",
    "pack_subpixel_kernel_fwd",
]


def pack_subpixel_kernel(w: jax.Array) -> jax.Array:
    """Repack a (3, 3, out, in) TF-layout stride-2 convT kernel for the
    sub-pixel (dense conv + depth-to-space) formulation: (2, 2, in, 4*out).

    A stride-2 3x3 SAME conv_transpose with even output (out = 2*in) is
    exactly a dense 2x2 conv at the input resolution producing the four
    output phases as channels: output pixel (2i+py, 2j+px) only reads input
    pixels {i-1, i} x {j-1, j} through taps with k == p (mod 2), i.e.
    y[2i + p] = sum_{k == p mod 2} x[(2i + p - k)/2] * w[k].  With the dense
    conv padded ((1,0),(1,0)) so tap d in {0,1} reads x[i-1+d], the packed
    slot is w_packed[d][phase p] = w[k], k = p + 2*(1 - d) (empty when
    k == 3).  The packed kernel is 9/16 dense — the recast trades 16/9x the
    FLOPs for up to 4x MXU lane occupancy, a win exactly where the decoder
    tail is lane-bound (cout 32/64 at 64^2/32^2 spatial; DESIGN.md §4).
    Phase channels are (py, px) row-major, matching ``_depth_to_space``.
    """
    kh, kw, cout, cin = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"subpixel pack requires a 3x3 kernel, got {kh}x{kw}")
    empty = jnp.zeros((cin, cout), w.dtype)
    taps = []
    for dy in range(2):
        for dx in range(2):
            phases = []
            for py in range(2):
                for px in range(2):
                    ky = py + 2 * (1 - dy)
                    kx = px + 2 * (1 - dx)
                    ok = ky < 3 and kx < 3
                    phases.append(w[ky, kx].T if ok else empty)
            # (cin, 4, cout) for this tap
            taps.append(jnp.stack(phases, axis=1))
    packed = jnp.stack(taps, axis=0).reshape(2, 2, cin, 4 * cout)
    return packed


def pack_subpixel_kernel_s1(w: jax.Array) -> jax.Array:
    """Repack a (3, 3, out, in) TF-layout *stride-1* convT kernel for the
    output-patch sub-pixel formulation: (4, 4, in, 4*out).

    A stride-1 3x3 SAME conv_transpose on even-sized input equals a
    stride-2 4x4 conv producing each 2x2 output patch as four phase
    channels: output row 2j+p reads input rows 2j+p-1 .. 2j+p+1, all
    within the 4-row window 2j-1 .. 2j+2, so with padding ((1,1),(1,1))
    tap d reads x[2j+d-1] and w4[d][phase p] = u[d-p] (zero outside
    0 <= d-p <= 2), where u is the convT kernel as a forward-conv HWIO
    kernel (spatial flip + channel transpose: stride-1 conv_transpose ==
    correlation with the 180-degree-rotated kernel).

    Density is 9/16 per phase — the same 16/9x-FLOPs-for-4x-lanes trade
    as the stride-2 recast.  (This is NOT the packed-input space-to-depth
    variant DESIGN.md §4 rejected, which is 4x FLOPs: packing the *output*
    patch instead of both sides keeps the receptive field exactly 4x4.)
    Phase channel order matches ``_depth_to_space``.
    """
    kh, kw, cout, cin = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"subpixel pack requires a 3x3 kernel, got {kh}x{kw}")
    # Forward-conv HWIO kernel u[m, n, cin, cout] = w[2-m, 2-n].T; the
    # phase/tap packing is then the forward-conv one.
    return pack_subpixel_kernel_fwd(jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)))


def pack_subpixel_kernel_fwd(w: jax.Array) -> jax.Array:
    """Repack a (3, 3, in, out) HWIO *forward* stride-1 conv kernel for the
    output-patch sub-pixel formulation: (4, 4, in, 4*out).

    Identical derivation to :func:`pack_subpixel_kernel_s1` without the
    spatial flip / channel transpose (a forward SAME conv reads
    y[2j+p] = sum_m x[2j+p+m-1] w[m], so tap d = p+m and
    w4[d][phase p] = w[d-p] for 0 <= d-p <= 2).
    """
    kh, kw, cin, cout = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"subpixel pack requires a 3x3 kernel, got {kh}x{kw}")
    empty = jnp.zeros((cin, cout), w.dtype)
    taps = []
    for dy in range(4):
        for dx in range(4):
            phases = []
            for py in range(2):
                for px in range(2):
                    my = dy - py
                    mx = dx - px
                    ok = 0 <= my <= 2 and 0 <= mx <= 2
                    phases.append(w[my, mx] if ok else empty)
            taps.append(jnp.stack(phases, axis=1))  # (cin, 4, cout)
    packed = jnp.stack(taps, axis=0).reshape(4, 4, cin, 4 * cout)
    return packed


class SubpixelConv2D(nn.Module):
    """Stride-1 3x3 SAME forward conv in the output-patch sub-pixel
    formulation (stride-2 4x4 conv to 4x phase channels + depth-to-space).

    Parameter tree (kernel (3,3,in,out) HWIO + bias) matches
    ``flax.linen.Conv`` exactly, so instantiating this with the same
    ``name`` as the Conv it replaces keeps checkpoints interchangeable.
    Requires even spatial input; falls back to the stock conv otherwise.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xd = x.astype(self.dtype)
        if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            packed = pack_subpixel_kernel_fwd(kernel).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                xd,
                packed,
                window_strides=(2, 2),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self.precision,
            )
            y = _depth_to_space(y)
        else:
            y = jax.lax.conv_general_dilated(
                xd,
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self.precision,
            )
        return y + bias.astype(self.dtype)


def _depth_to_space(y: jax.Array) -> jax.Array:
    """(N, S, S, 4*C) phase channels (row-major 2x2) -> (N, 2S, 2S, C)."""
    n, s, _, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, s, s, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * s, 2 * s, c)


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
    # Sub-pixel formulation for the stride-2 3x3 case: dense 2x2 conv to
    # 4x channels + depth-to-space, numerically equal to conv_transpose but
    # MXU-lane-friendly at small channel counts (see pack_subpixel_kernel).
    # The stored parameter keeps the TF (kh, kw, out, in) layout either way,
    # so checkpoints are interchangeable across the flag.
    subpixel: bool = False
    precision: jax.lax.Precision | None = None

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
        use_subpixel = (
            self.subpixel
            and (kh, kw) == (3, 3)
            and (
                self.strides == (2, 2)
                or (self.strides == (1, 1) and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
            )
        )
        if use_subpixel and self.strides == (2, 2):
            packed = pack_subpixel_kernel(kernel).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                packed,
                window_strides=(1, 1),
                padding=((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self.precision,
            )
            y = _depth_to_space(y)
        elif use_subpixel:
            packed = pack_subpixel_kernel_s1(kernel).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                packed,
                window_strides=(2, 2),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self.precision,
            )
            y = _depth_to_space(y)
        else:
            # With transpose_kernel=True the kernel is described as the
            # *forward* conv's HWIO: our TF-layout (kh, kw, out_T, in_T) is
            # the forward kernel (kh, kw, in_fwd=out_T, out_fwd=in_T), i.e.
            # exactly HWIO.
            y = jax.lax.conv_transpose(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                strides=self.strides,
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
                precision=self.precision,
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y
