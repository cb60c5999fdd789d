"""Fused matched-filter Pallas kernel: parity with the XLA detection path
(interpreter mode on CPU; the TPU-compiled path is exercised by bench/drive
scripts on hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.kernels.matched_filter import _separate, matched_filter_threshold
from debvader_tpu.ops.detection import _conv2d_same, default_filter_kernel


def test_stock_kernel_is_separable():
    sep = _separate(default_filter_kernel())
    assert sep is not None
    wy, wx = sep
    np.testing.assert_allclose(
        np.outer(wy, wx), default_filter_kernel(), atol=1e-6
    )


def test_non_separable_kernel_falls_back():
    k = default_filter_kernel().copy()
    k[0, 6] += 0.5  # break rank-1
    assert _separate(k) is None
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((64, 64)), jnp.float32)
    back = jnp.zeros((64, 64), jnp.float32)
    want = np.asarray(_conv2d_same(img, jnp.asarray(k)))
    filt, _ = matched_filter_threshold(img, back, k, 1.0, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(filt), want, atol=1e-5)


@pytest.mark.parametrize("f,tile", [(128, 64), (259, 128), (300, 256)])
def test_parity_with_xla_conv(f, tile):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((f, f)), jnp.float32)
    back = jnp.asarray(rng.random((f, f)) * 0.1, jnp.float32)
    k = default_filter_kernel()
    want = np.asarray(_conv2d_same(img - back, jnp.asarray(k)))
    filt, mask = matched_filter_threshold(img, back, k, 5.0, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(filt), want, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(mask), (want > 5.0).astype(np.float32)
    )


def test_threshold_is_runtime_value():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((64, 64)) * 10, jnp.float32)
    back = jnp.zeros((64, 64), jnp.float32)
    k = default_filter_kernel()
    _, m_lo = matched_filter_threshold(img, back, k, 1.0, tile=64, interpret=True)
    _, m_hi = matched_filter_threshold(img, back, k, 1000.0, tile=64, interpret=True)
    assert float(jnp.sum(m_lo)) > float(jnp.sum(m_hi))
    assert float(jnp.sum(m_hi)) == 0.0


def test_detection_with_pallas_filter_backend():
    # end-to-end detect_sources parity between XLA and Pallas filter paths
    from debvader_tpu.config import DetectionConfig
    from debvader_tpu.ops.detection import detect_sources

    rng = np.random.default_rng(3)
    img = (5.0 + 0.01 * rng.normal(size=(128, 128))).astype(np.float32)
    yy, xx = np.mgrid[:128, :128]
    for cy, cx, a in [(30.0, 40.0, 3.0), (90.0, 100.0, 2.0)]:
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.6**2))
    a_ = detect_sources(img, DetectionConfig(thresh=25.0))
    b_ = detect_sources(img, DetectionConfig(thresh=25.0, use_pallas_filter=True))
    assert len(a_["y"]) == len(b_["y"]) == 2
    np.testing.assert_allclose(sorted(a_["y"]), sorted(b_["y"]), atol=0.01)
