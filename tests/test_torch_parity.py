"""Independent cross-validation of TF/Keras conv semantics against torch.

The weight importer's correctness hinges on our conv/convT reproducing
Keras's exact arithmetic.  test_model.py proves ConvTranspose2DTF == the
gradient of a SAME conv (TF's definition); here torch (CPU) provides an
independent implementation to check against, with TF 'SAME' padding applied
manually (asymmetric: pad_total = max((out-1)*s + k - in, 0), extra pixel
on the bottom/right)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from flax import linen as nn  # noqa: E402

from debvader_tpu.models.layers import ConvTranspose2DTF


def _tf_same_pads(in_size, k, s):
    out = -(-in_size // s)
    pad_total = max((out - 1) * s + k - in_size, 0)
    lo = pad_total // 2
    return lo, pad_total - lo


@torch.no_grad()
def _torch_conv_same(x_nhwc, kernel_hwio, stride):
    n, h, w, cin = x_nhwc.shape
    k = kernel_hwio.shape[0]
    lo_h, hi_h = _tf_same_pads(h, k, stride)
    lo_w, hi_w = _tf_same_pads(w, k, stride)
    xt = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    xt = F.pad(xt, (lo_w, hi_w, lo_h, hi_h))
    wt = torch.from_numpy(np.transpose(kernel_hwio, (3, 2, 0, 1)).copy())
    y = F.conv2d(xt, wt, stride=stride)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@torch.no_grad()
def _torch_convt_tf_same(x_nhwc, kernel_hwoi, stride):
    """TF Conv2DTranspose 'same': full conv_transpose then crop to in*s with
    the SAME-gradient alignment (crop pad_lo from top/left)."""
    n, h, w, cin = x_nhwc.shape
    k = kernel_hwoi.shape[0]
    out_h = h * stride
    lo_h, _ = _tf_same_pads(out_h, k, stride)
    lo_w, _ = _tf_same_pads(out_h, k, stride)
    xt = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    # torch weight layout (in, out, kh, kw); TF convT kernel is (kh, kw, out, in)
    wt = torch.from_numpy(np.transpose(kernel_hwoi, (3, 2, 0, 1)).copy())
    y = F.conv_transpose2d(xt, wt, stride=stride)  # full output
    y = y[:, :, lo_h : lo_h + out_h, lo_w : lo_w + out_h]
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_conv_stride2_same_asymmetric_matches_torch():
    # in=30 with k=3, s=2 pads (0, 1): the asymmetric case that breaks
    # naive symmetric padding.
    rng = np.random.default_rng(0)
    for size in (30, 59, 15, 8):
        x = rng.normal(size=(2, size, size, 4)).astype(np.float32)
        kernel = rng.normal(size=(3, 3, 4, 8)).astype(np.float32) * 0.1
        mod = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)
        variables = {"params": {"kernel": jnp.asarray(kernel)}}
        got = np.asarray(mod.apply(variables, jnp.asarray(x)))
        want = _torch_conv_same(x, kernel, 2)
        assert got.shape == want.shape == (2, -(-size // 2), -(-size // 2), 8)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv_transpose_stride2_matches_torch():
    rng = np.random.default_rng(1)
    for size in (4, 8, 15):
        x = rng.normal(size=(2, size, size, 6)).astype(np.float32)
        kernel = rng.normal(size=(3, 3, 5, 6)).astype(np.float32) * 0.1  # (kh,kw,out,in)
        mod = ConvTranspose2DTF(5, (3, 3), strides=(2, 2), use_bias=False)
        variables = {"params": {"kernel": jnp.asarray(kernel)}}
        got = np.asarray(mod.apply(variables, jnp.asarray(x)))
        want = _torch_convt_tf_same(x, kernel, 2)
        assert got.shape == want.shape == (2, size * 2, size * 2, 5)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv_transpose_stride1_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    kernel = rng.normal(size=(3, 3, 4, 3)).astype(np.float32) * 0.1
    mod = ConvTranspose2DTF(4, (3, 3), strides=(1, 1), use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(kernel)}}
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    want = _torch_convt_tf_same(x, kernel, 1)
    np.testing.assert_allclose(got, want, atol=2e-5)
