"""Pallas TPU kernel: fused background-subtract + matched filter + threshold.

Detection's per-pixel pipeline (ops/detection.py steps 1-2) is three
HBM-bound passes in the XLA path: subtract the background map, convolve with
the 7x7 Gaussian, compare against the threshold.  This kernel fuses them
into one pass over the field:

- grid over (TILE, TILE) output tiles; each program reads a halo'd
  (TILE+6, TILE+6) input block (overlapping BlockSpec reads) for the image
  and the background map;
- the 7x7 convolution unrolls into 49 static shifted multiply-adds on the
  VPU — no gathers, no MXU detour for a 1-channel conv;
- outputs the filtered image and the detection mask in the same pass.

Input is pre-padded by 3 on each side (SAME semantics).  Parity with the
XLA path is asserted in tests/test_pallas_detection.py (interpreter mode)
and was verified compiled on TPU v5e (max |diff| 5e-6 on a 4096^2 field).

Measured on v5e (4096^2 field, tile 256): 27.9 ms vs 25.9 ms for the XLA
sub+conv+compare chain — XLA already fuses this pattern to the bandwidth
roofline, so the kernel is an optional backend
(DetectionConfig.use_pallas_filter), kept as the foundation for fusing the
*rest* of the detection pipeline (threshold + parent-pointer computation)
into the same pass, where XLA cannot follow.  Note: pixels whose filtered
value sits within float32 epsilon of the threshold can flip between the
two backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["matched_filter_threshold"]

_HALO = 3  # 7x7 kernel


def _separate(kernel: np.ndarray):
    """Rank-1 (separable) decomposition when exact; None otherwise.

    The stock gauss_3.0_7x7 matched filter is exactly an outer product, so
    the separable path is the one that runs in production: 14 fused
    multiply-adds instead of 49, and far fewer live VMEM temporaries.
    """
    u, s, vt = np.linalg.svd(kernel)
    if s[1] > 1e-4 * s[0]:
        return None
    wy = u[:, 0] * np.sqrt(s[0])
    wx = vt[0] * np.sqrt(s[0])
    if wy.sum() < 0:
        wy, wx = -wy, -wx
    return wy.astype(np.float32), wx.astype(np.float32)


def _mf_kernel(img_ref, back_ref, thresh_ref, filt_ref, mask_ref, *, kernel, tile):
    """img/back blocks are halo'd; outputs (tile, tile)."""
    fore = img_ref[:, :] - back_ref[:, :]
    sep = _separate(kernel)
    if sep is not None:
        wy, wx = sep
        tmp = jnp.zeros((tile, fore.shape[1]), jnp.float32)
        for dy in range(7):
            tmp = tmp + float(wy[dy]) * fore[dy : dy + tile, :]
        acc = jnp.zeros((tile, tile), jnp.float32)
        for dx in range(7):
            acc = acc + float(wx[dx]) * tmp[:, dx : dx + tile]
    else:
        acc = jnp.zeros((tile, tile), jnp.float32)
        for dy in range(7):
            for dx in range(7):
                w = float(kernel[dy, dx])
                acc = acc + w * fore[dy : dy + tile, dx : dx + tile]
    thresh = thresh_ref[0]
    filt_ref[:, :] = acc
    mask_ref[:, :] = (acc > thresh).astype(jnp.float32)


def matched_filter_threshold(
    image: jax.Array,
    background: jax.Array,
    kernel: np.ndarray,
    threshold: jax.Array,
    tile: int = 256,
    interpret: bool = False,
):
    """(filtered, mask) for a 2D field in one fused pass.

    image, background: (F, F) float32; kernel: static (7, 7) numpy array
    (the weights unroll into the kernel body); threshold: scalar.  Border
    semantics are SAME with zero padding, exactly like the XLA path's conv
    (ops/detection.py _conv2d_same).
    """
    kernel = np.asarray(kernel, np.float32)
    if kernel.shape != (7, 7):
        raise ValueError("matched_filter_threshold expects a 7x7 kernel")
    kernel_key = tuple(map(tuple, kernel.tolist()))
    return _mft_jit(image, background, kernel_key, threshold, tile, interpret)


@partial(jax.jit, static_argnames=("kernel_key", "tile", "interpret"))
def _mft_jit(
    image: jax.Array,
    background: jax.Array,
    kernel_key: tuple,
    threshold: jax.Array,
    tile: int,
    interpret: bool,
):
    f = image.shape[0]
    kernel = np.asarray(kernel_key, np.float32)

    grid_n = pl.cdiv(f, tile)
    padded_f = grid_n * tile

    # Mosaic requires the last two block dims to be multiples of (8, 128);
    # the 6-px halo is widened to an aligned (8, 128) over-read window.
    halo_r, halo_c = 8, 128

    # Pad to the tile grid plus the aligned halo.  Conv halo of 3 leads the
    # window; the over-read tail is zeros.
    img_p = jnp.pad(
        image.astype(jnp.float32),
        ((_HALO, padded_f - f + halo_r - _HALO), (_HALO, padded_f - f + halo_c - _HALO)),
    )
    back_p = jnp.pad(
        background.astype(jnp.float32),
        ((_HALO, padded_f - f + halo_r - _HALO), (_HALO, padded_f - f + halo_c - _HALO)),
    )

    # Overlapping halo reads: Element-indexed blocks start at i*tile
    # (element units) and span tile+halo, so consecutive blocks share it.
    halo_spec = pl.BlockSpec(
        (pl.Element(tile + halo_r), pl.Element(tile + halo_c)),
        lambda i, j: (i * tile, j * tile),
        memory_space=pltpu.VMEM,
    )

    filt, mask = pl.pallas_call(
        partial(_mf_kernel, kernel=kernel, tile=tile),
        out_shape=(
            jax.ShapeDtypeStruct((padded_f, padded_f), jnp.float32),
            jax.ShapeDtypeStruct((padded_f, padded_f), jnp.float32),
        ),
        grid=(grid_n, grid_n),
        in_specs=[
            halo_spec,
            halo_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(img_p, back_p, jnp.asarray(threshold, jnp.float32).reshape(1))
    return filt[:f, :f], mask[:f, :f]
