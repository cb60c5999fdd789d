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


def _xla_select_step(cur, dir_code):
    """Reference 9-way shifted select (ops/detection.py XLA path)."""
    f = cur.shape[0]
    curp = np.pad(cur, 1)
    acc = cur.copy()
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    for code, (dy, dx) in enumerate(offsets):
        if dy == 0 and dx == 0:
            continue
        shifted = curp[1 + dy : 1 + dy + f, 1 + dx : 1 + dx + f]
        acc = np.where(dir_code == code, shifted, acc)
    return acc


def _random_parent_field(f, seed):
    """(parent, dir) built exactly like the detection core: steepest 3x3
    neighbor of a random value field with (value, -index) tiebreak — an
    acyclic ascent forest (arbitrary random directions would contain
    cycles, which real parents cannot)."""
    rng = np.random.default_rng(seed)
    val = rng.random((f, f)).astype(np.float32)
    vp = np.pad(val, 1, constant_values=-np.inf)
    idx = np.arange(f * f).reshape(f, f)
    ip = np.pad(idx, 1, constant_values=0)
    best_v, best_i = val.copy(), idx.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nv = vp[1 + dy : 1 + dy + f, 1 + dx : 1 + dx + f]
            ni = ip[1 + dy : 1 + dy + f, 1 + dx : 1 + dx + f]
            better = (nv > best_v) | ((nv == best_v) & (ni < best_i))
            best_v = np.where(better, nv, best_v)
            best_i = np.where(better, ni, best_i)
    parent = best_i.astype(np.int32)
    iy, ix = np.mgrid[:f, :f]
    dir_code = ((parent // f - iy + 1) * 3 + (parent % f - ix + 1)).astype(
        np.int32
    )
    return parent, dir_code


@pytest.mark.parametrize("f,rows", [(128, 64), (256, 128)])
def test_label_select_step_parity(f, rows):
    from debvader_tpu.kernels.label_select import label_select_step

    cur, dir_code = _random_parent_field(f, seed=2)
    want = _xla_select_step(cur, dir_code)
    got = np.asarray(
        label_select_step(
            jnp.asarray(cur), jnp.asarray(dir_code), rows=rows, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


def test_label_select_fixpoint_matches_gather_resolution():
    from debvader_tpu.kernels.label_select import label_select_fixpoint

    f = 128
    cur, dir_code = _random_parent_field(f, seed=5)
    labels, n_chunks = label_select_fixpoint(
        jnp.asarray(cur), jnp.asarray(dir_code), rows=64, interpret=True
    )
    # gather-based fixpoint of the same (acyclic) parent map
    want = cur.ravel().copy()
    for _ in range(16):
        want = want[want]
    assert (want == want[want]).all()  # reached the true fixpoint
    np.testing.assert_array_equal(np.asarray(labels).ravel(), want)
    assert int(n_chunks) >= 1


@pytest.mark.parametrize("steps", [2, 4, 16])
def test_label_select_multi_step_parity(steps):
    from debvader_tpu.kernels.label_select import label_select_step

    f = 128
    cur, dir_code = _random_parent_field(f, seed=9)
    want = cur
    for _ in range(steps):
        want = _xla_select_step(want, dir_code)
    got = np.asarray(
        label_select_step(
            jnp.asarray(cur), jnp.asarray(dir_code), rows=64, steps=steps,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)
