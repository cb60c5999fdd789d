"""Fused matched-filter + watershed-parents kernel: parity with the XLA
detection path (interpreter mode on CPU; compiled parity and perf are
re-measured on TPU hardware by scripts/bench_detect.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.config import DetectionConfig
from debvader_tpu.kernels.detect_fused import matched_filter_parents
from debvader_tpu.ops.detection import _conv2d_same, default_filter_kernel


def _xla_race(filt, threshold):
    """Reference steepest-ascent race (ops/detection.py _detect_core):
    (parent, dir_code, mask) from a filtered field."""
    f = filt.shape[0]
    mask = filt > threshold
    flat_idx = np.arange(f * f, dtype=np.int32).reshape(f, f)
    neg_inf = -np.inf
    val = np.where(mask, filt, neg_inf)
    best_val = val.copy()
    best_idx = flat_idx.copy()
    vp = np.pad(val, 1, constant_values=neg_inf)
    ip = np.pad(flat_idx, 1, constant_values=0)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nv = vp[1 + dy : 1 + dy + f, 1 + dx : 1 + dx + f]
            ni = ip[1 + dy : 1 + dy + f, 1 + dx : 1 + dx + f]
            better = (nv > best_val) | ((nv == best_val) & (ni < best_idx))
            best_val = np.where(better, nv, best_val)
            best_idx = np.where(better, ni, best_idx)
    parent = np.where(mask, best_idx, -1)
    iy, ix = np.mgrid[:f, :f]
    pdy = np.clip(parent // f - iy, -1, 1)
    pdx = np.clip(parent % f - ix, -1, 1)
    dir_code = np.where(mask, (pdy + 1) * 3 + (pdx + 1), 4)
    return parent, dir_code, mask


def _field(f, seed, nsrc=6):
    rng = np.random.default_rng(seed)
    img = 0.2 * rng.normal(size=(f, f)).astype(np.float32)
    yy, xx = np.mgrid[:f, :f]
    for _ in range(nsrc):
        cy, cx = rng.uniform(3, f - 3, 2)
        img += rng.uniform(2, 6) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.8**2)
        ).astype(np.float32)
    return img


@pytest.mark.parametrize("f,tile", [(128, 64), (200, 128)])
def test_fused_filter_and_parents_parity(f, tile):
    img = _field(f, seed=1)
    back = (0.1 * np.ones((f, f))).astype(np.float32)
    k = default_filter_kernel()
    thr = 1.0

    filt, dirc, cur = matched_filter_parents(
        jnp.asarray(img)[None], jnp.asarray(back)[None], k,
        jnp.asarray([thr]), tile=tile, interpret=True,
    )
    p = filt.shape[-1]
    filt_np = np.asarray(filt)[0][:f, :f]

    # filtered values match the XLA conv chain to float epsilon
    want = np.asarray(_conv2d_same(jnp.asarray(img - back), jnp.asarray(k)))
    np.testing.assert_allclose(filt_np, want, atol=2e-5)

    # dir codes / parents are bit-identical to the XLA race on the kernel's
    # own filtered output
    parent, dir_code, mask = _xla_race(filt_np, thr)
    np.testing.assert_array_equal(np.asarray(dirc)[0][:f, :f], dir_code)
    np.testing.assert_array_equal(
        np.asarray(cur)[0][:f, :f], np.where(mask, parent, 0)
    )
    # padded region is inert: dir 4, parent 0
    if p > f:
        assert (np.asarray(dirc)[0][f:, :] == 4).all()
        assert (np.asarray(cur)[0][f:, :] == 0).all()


def test_fused_stack_per_tile_thresholds():
    f, tile = 128, 64
    imgs = np.stack([_field(f, seed=2), _field(f, seed=3)])
    back = np.zeros((2, f, f), np.float32)
    k = default_filter_kernel()
    thrs = np.asarray([0.5, 50.0], np.float32)
    filt, dirc, cur = matched_filter_parents(
        jnp.asarray(imgs), jnp.asarray(back), k, jnp.asarray(thrs),
        tile=tile, interpret=True,
    )
    m0 = np.asarray(filt)[0][:f, :f] > thrs[0]
    m1 = np.asarray(filt)[1][:f, :f] > thrs[1]
    # low threshold admits pixels, absurdly high one admits none
    assert m0.sum() > 0
    assert m1.sum() == 0
    assert (np.asarray(dirc)[1][:f, :f] == 4).all()


def test_detect_sources_fused_end_to_end_parity():
    """detect_sources with the fused kernel (interpret) finds the same
    sources as the XLA path."""
    from debvader_tpu.ops.detection import detect_sources

    img = _field(150, seed=4, nsrc=4)
    a = detect_sources(img, DetectionConfig(thresh=5.0))
    b = detect_sources(img, DetectionConfig(thresh=5.0, use_pallas_fused=True))
    assert len(a["y"]) == len(b["y"]) > 0
    np.testing.assert_allclose(sorted(a["y"]), sorted(b["y"]), atol=1e-3)
    np.testing.assert_allclose(sorted(a["x"]), sorted(b["x"]), atol=1e-3)


def test_detect_sources_batched_fused_composes():
    """The fused path composes with detect_sources_batched (no serial
    fallback): same per-tile results as the XLA batched path."""
    from debvader_tpu.ops.detection import detect_sources_batched

    tiles = np.stack([_field(128, seed=5, nsrc=3), _field(128, seed=6, nsrc=3)])
    a = detect_sources_batched(tiles, DetectionConfig(thresh=5.0))
    b = detect_sources_batched(
        tiles, DetectionConfig(thresh=5.0, use_pallas_fused=True)
    )
    for ta, tb in zip(a, b):
        assert len(ta["y"]) == len(tb["y"]) > 0
        np.testing.assert_allclose(sorted(ta["y"]), sorted(tb["y"]), atol=1e-3)
