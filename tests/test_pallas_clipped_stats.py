"""Parity tests for the sort-free Pallas sigma-clip kernel
(kernels/clipped_stats.py) against the XLA sort-once formulation
(ops/detection.py _sigma_clipped_stats).  CPU runs use the Pallas
interpreter; the real-TPU path is exercised by the detect-core benches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.kernels.clipped_stats import sigma_clipped_stats_pallas
from debvader_tpu.ops.detection import _sigma_clipped_stats, estimate_background


def _contaminated(rng, g, p, mask_frac=0.0):
    data = rng.normal(3.0, 0.05, size=(g, g, p)).astype(np.float32)
    hot = rng.random((g, g, p)) < 0.02
    data[hot] += rng.uniform(1, 30, hot.sum()).astype(np.float32)
    valid = (rng.random((g, g, p)) > mask_frac).astype(np.float32)
    return np.where(valid > 0, data, 0.0), valid


def test_matches_xla_formulation():
    """Same clip semantics as the sort-once path on contaminated,
    partially-masked, fully-masked and all-zero boxes (the empty-clip
    resurrection quirk); only float summation order may differ."""
    rng = np.random.default_rng(0)
    for trial in range(4):
        data, valid = _contaminated(rng, 6, 128, mask_frac=0.3 if trial % 2 else 0.0)
        if trial == 2:
            valid[0, 0, :] = 0  # fully-masked box
        if trial == 3:
            data[1, 1, :] = 0.0  # all-zero box
        b, v = jnp.asarray(data), jnp.asarray(valid)
        want = jax.device_get(_sigma_clipped_stats(b, valid=v))
        got = jax.device_get(sigma_clipped_stats_pallas(b, v, interpret=True))
        for name, x1, x2 in zip(("mean", "med", "std"), want, got):
            np.testing.assert_allclose(
                np.asarray(x2), np.asarray(x1), atol=5e-5, err_msg=f"{trial}/{name}"
            )


def test_median_is_exact_rank_statistic():
    """With no clip iterations the median must be BIT-identical to sorting
    the valid values and indexing (count-1)//2 — the radix descend is an
    exact selection, not an approximation.  Includes negative values and
    duplicates (the key map must order negatives correctly)."""
    rng = np.random.default_rng(1)
    data = rng.normal(0.0, 1.0, size=(5, 3, 257)).astype(np.float32)
    data[0, 0, :10] = -data[0, 0, :10]  # force negatives
    data[1, 1, :] = np.float32(0.25)  # all-equal box
    valid = (rng.random((5, 3, 257)) > 0.2).astype(np.float32)
    b = jnp.asarray(np.where(valid > 0, data, 0.0))
    v = jnp.asarray(valid)
    _, med, _ = jax.device_get(
        sigma_clipped_stats_pallas(b, v, iters=0, interpret=True)
    )
    for i in range(5):
        for j in range(3):
            vals = np.sort(data[i, j][valid[i, j] > 0])
            want = vals[(len(vals) - 1) // 2] if len(vals) else 0.0
            assert np.float32(want) == np.float32(med[i, j]), (i, j)


def test_padding_and_block_edges():
    """Row counts that are not a multiple of the block pad cleanly and the
    padded rows never leak into real outputs."""
    rng = np.random.default_rng(2)
    data, valid = _contaminated(rng, 5, 64)  # 25 rows, block default 32
    b, v = jnp.asarray(data), jnp.asarray(valid)
    want = jax.device_get(_sigma_clipped_stats(b, valid=v))
    got = jax.device_get(sigma_clipped_stats_pallas(b, v, interpret=True, block=8))
    for x1, x2 in zip(want, got):
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=5e-5)


def test_estimate_background_pallas_switch():
    """estimate_background(use_pallas=True) produces the same meshes as the
    XLA path (interpreter off-TPU), including non-finite pixel exclusion."""
    rng = np.random.default_rng(3)
    img = rng.normal(0.1, 0.02, size=(128, 128)).astype(np.float32)
    img[10:14, 20:24] = np.nan  # chip gap
    back_p, rms_p, gb_p, grms_p = jax.device_get(
        estimate_background(jnp.asarray(img), box=32, use_pallas=True)
    )
    back_x, rms_x, gb_x, grms_x = jax.device_get(
        estimate_background(jnp.asarray(img), box=32, use_pallas=False)
    )
    np.testing.assert_allclose(back_p, back_x, atol=1e-5)
    np.testing.assert_allclose(rms_p, rms_x, atol=1e-5)
    assert abs(float(gb_p) - float(gb_x)) < 1e-5
    assert abs(float(grms_p) - float(grms_x)) < 1e-5
    assert np.isfinite(back_p).all()


def test_detection_outputs_match_with_pallas_clip():
    """End to end: detect_sources with the Pallas clip (forced, interpreter)
    finds the same sources as the XLA background on a synthetic field."""
    import dataclasses

    from debvader_tpu.config import DetectionConfig
    from debvader_tpu.ops.detection import detect_sources

    rng = np.random.default_rng(4)
    img = rng.normal(0.0, 0.004, size=(256, 256)).astype(np.float32)
    yy, xx = np.mgrid[-6:7, -6:7]
    prof = np.exp(-(yy**2 + xx**2) / (2 * 1.6**2)).astype(np.float32)
    for cy, cx, a in ((40, 50, 2.0), (120, 200, 1.0), (200, 80, 3.5)):
        img[cy - 6 : cy + 7, cx - 6 : cx + 7] += a * prof
    base = DetectionConfig(threshold_scaling="matched", thresh=25.0)
    res_p = detect_sources(img, dataclasses.replace(base, use_pallas_clip=True))
    res_x = detect_sources(img, dataclasses.replace(base, use_pallas_clip=False))
    assert len(res_p["y"]) == len(res_x["y"]) == 3
    np.testing.assert_allclose(res_p["y"], res_x["y"], atol=1e-3)
    np.testing.assert_allclose(res_p["x"], res_x["x"], atol=1e-3)
