"""Detection tests: background estimation, thresholding, watershed
segmentation/deblending, centroids, minarea, and the reference offset
convention — on synthetic fields with known ground truth, plus DC2 sanity."""

import jax
import numpy as np
import pytest

from debvader_tpu.config import DetectionConfig
from debvader_tpu.ops.detection import (
    default_filter_kernel,
    detect_objects,
    detect_sources,
    estimate_background,
)


def _field(f=128, noise=0.02, back=5.0, seed=0):
    rng = np.random.default_rng(seed)
    return (back + noise * rng.normal(size=(f, f))).astype(np.float32)


def _add_gauss(img, cy, cx, amp, sigma=1.6):
    f = img.shape[0]
    yy, xx = np.mgrid[:f, :f]
    img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))
    return img


def test_filter_kernel_matches_reference_matrix():
    # The reference hardcodes the 7x7 FWHM-3 Gaussian (detection.py:25-35);
    # our analytic regeneration must match it.
    ref = np.array(
        [
            [0.004963, 0.021388, 0.051328, 0.068707, 0.051328, 0.021388, 0.004963],
            [0.021388, 0.092163, 0.221178, 0.296069, 0.221178, 0.092163, 0.021388],
            [0.051328, 0.221178, 0.530797, 0.710525, 0.530797, 0.221178, 0.051328],
            [0.068707, 0.296069, 0.710525, 0.951108, 0.710525, 0.296069, 0.068707],
            [0.051328, 0.221178, 0.530797, 0.710525, 0.530797, 0.221178, 0.051328],
            [0.021388, 0.092163, 0.221178, 0.296069, 0.221178, 0.092163, 0.021388],
            [0.004963, 0.021388, 0.051328, 0.068707, 0.051328, 0.021388, 0.004963],
        ]
    )
    got = default_filter_kernel(7, 3.0)
    # the reference matrix is normalized to the same center-relative profile
    np.testing.assert_allclose(got / got.max(), ref / ref.max(), atol=2e-4)


def test_background_estimation_flat_field():
    img = _field(f=128, noise=0.05, back=7.0)
    back, rms, gb, grms = estimate_background(img, box=32)
    np.testing.assert_allclose(float(gb), 7.0, atol=0.01)
    np.testing.assert_allclose(float(grms), 0.05, rtol=0.1)
    np.testing.assert_allclose(np.asarray(back), 7.0, atol=0.02)


def test_background_gradient_field():
    f = 128
    yy, _ = np.mgrid[:f, :f]
    img = (3.0 + 0.01 * yy + 0.02 * np.random.default_rng(1).normal(size=(f, f))).astype(
        np.float32
    )
    back, _, _, _ = estimate_background(img, box=32)
    # mesh + bilinear tracks the gradient away from the edges
    err = np.abs(np.asarray(back) - (3.0 + 0.01 * yy))[16:-16, 16:-16]
    assert err.max() < 0.05


def test_detect_isolated_sources_count_and_centroids():
    img = _field()
    truth = [(30.0, 40.0, 3.0), (90.0, 100.0, 2.0), (64.0, 20.0, 5.0)]
    for cy, cx, a in truth:
        _add_gauss(img, cy, cx, a)
    obj = detect_sources(img, DetectionConfig(thresh=25.0))
    assert len(obj["y"]) == 3
    got = sorted(zip(obj["y"], obj["x"]))
    want = sorted((cy, cx) for cy, cx, _ in truth)
    for (gy, gx), (wy, wx) in zip(got, want):
        assert abs(gy - wy) < 0.5 and abs(gx - wx) < 0.5


def test_deblend_splits_close_pair():
    # two peaks 6 px apart: a single threshold component, must split
    img = _field(noise=0.01)
    _add_gauss(img, 60.0, 60.0, 3.0)
    _add_gauss(img, 60.0, 66.0, 2.5)
    obj = detect_sources(img, DetectionConfig(thresh=25.0))
    assert len(obj["y"]) == 2
    xs = sorted(obj["x"])
    assert abs(xs[0] - 60.0) < 1.0 and abs(xs[1] - 66.0) < 1.0


def test_minarea_rejects_single_pixel_spikes():
    # A marginal single-pixel spike clears threshold only at its center
    # after filtering (area 1 < minarea); a real source survives.
    # threshold = 25 * 0.01 * ||k||_2 ~= 0.565; spike amp 0.7 filters to
    # ~0.67 at center, ~0.50 at the 4-neighbors.
    img = _field(noise=0.01)
    img[50, 50] += 0.7
    _add_gauss(img, 90.0, 90.0, 3.0)
    obj = detect_sources(
        img,
        DetectionConfig(thresh=25.0, minarea=4, threshold_scaling="matched"),
    )
    assert all(abs(y - 90) < 1 for y in obj["y"])
    assert len(obj["y"]) == 1


def test_empty_field_no_detections():
    img = _field(noise=0.02)
    # 'matched' scales the threshold by ||k||_2; the sep_conv equivalent
    # significance needs thresh ~2.2x higher (||gauss_3_7x7||_2 ~= 2.21).
    obj = detect_sources(img, DetectionConfig(thresh=5.0, threshold_scaling="matched"))
    assert len(obj["y"]) == 0
    det = detect_objects(img, DetectionConfig(thresh=11.1))  # default sep_conv
    assert det.shape == (0, 2)


def test_detect_objects_offset_convention():
    # reference: offsets = round(-int(F/2) + y) (detection.py:48-56)
    img = _field(f=101, noise=0.01)
    _add_gauss(img, 70.0, 30.0, 4.0)
    det = detect_objects(img, DetectionConfig(thresh=25.0))
    assert det.shape == (1, 2)
    np.testing.assert_array_equal(det[0], [70 - 50, 30 - 50])


def test_detect_objects_multiband_uses_r_band():
    f = 101
    field = np.zeros((1, f, f, 6), np.float32)
    rng = np.random.default_rng(0)
    field += 0.01 * rng.normal(size=field.shape).astype(np.float32)
    band2 = field[0, :, :, 2].copy()
    _add_gauss(band2, 40.0, 60.0, 3.0)
    field[0, :, :, 2] = band2
    det = detect_objects(field, DetectionConfig(thresh=25.0))
    assert det.shape == (1, 2)
    np.testing.assert_array_equal(det[0], [40 - 50, 60 - 50])


def test_sep_conv_threshold_mode_runs():
    img = _field(noise=0.01)
    _add_gauss(img, 50.0, 50.0, 2.0)
    obj = detect_sources(img, DetectionConfig(thresh=25.0, threshold_scaling="sep_conv"))
    assert len(obj["y"]) >= 1


@pytest.mark.parametrize("idx", [2])
def test_dc2_field_detection_sanity(idx):
    # Bundled DC2 field: detection must find at least the truth sources'
    # scale of objects and produce offsets inside the field.
    field = np.load(
        f"/root/reference/src/debvader/data/dc2_imgs/field/field_img_{idx}.npy"
    )
    truth = np.load(
        "/root/reference/src/debvader/data/dc2_imgs/field/"
        f"gal_coordinates_complete_truth_catalog_{idx}.npy"
    )
    center = np.load(
        "/root/reference/src/debvader/data/dc2_imgs/field/"
        f"field_center_{idx}.npy"
    )
    det = detect_objects(field)
    assert len(det) >= len(truth) // 2
    assert (np.abs(det) <= field.shape[1] // 2 + 4).all()
    # most truth sources should have a detection within a few px.  The
    # truth catalog stores (x, y) global pixel coords; detections are
    # (row, col) offsets, so compare against (truth - center) swapped.
    tr = (np.asarray(truth, np.float64) - center)[:, [1, 0]]
    d = np.linalg.norm(tr[:, None, :2] - det[None, :, :2], axis=-1).min(1)
    assert np.median(d) < 1.5


def test_clean_pass_unit():
    """CLEAN (sep clean=True equivalent).  NOTE: in the full pipeline the
    steepest-ascent watershed already absorbs wing-riding bumps into the
    bright source's basin (they never become separate peaks), so CLEAN
    rarely fires — it remains as the guard for close same-basin splits."""
    from debvader_tpu.ops.detection import _clean_pass

    cfg = DetectionConfig()
    ys = np.array([50.0, 51.5, 100.0])
    xs = np.array([50.0, 50.0, 100.0])
    peaks = np.array([100.0, 10.0, 5.0])
    # at 1.5 px, wings of the bright peak at the faint one:
    # 100*exp(-2.25/6.45) ~ 70 >> 10 -> cleaned; isolated one survives
    keep = _clean_pass(ys, xs, peaks, cfg)
    np.testing.assert_array_equal(keep, [True, False, True])
    # far apart: everything survives
    keep = _clean_pass(
        np.array([10.0, 60.0]), np.array([10.0, 60.0]), np.array([100.0, 1.0]), cfg
    )
    np.testing.assert_array_equal(keep, [True, True])


def test_clean_preserves_dc2_truth_matches():
    field = np.load(
        "/root/reference/src/debvader/data/dc2_imgs/field/field_img_2.npy"
    )
    a = detect_objects(field, DetectionConfig(clean=False))
    b = detect_objects(field, DetectionConfig(clean=True))
    assert len(b) <= len(a)
    assert len(b) > 0.9 * len(a)  # CLEAN is a light touch here


def test_multi_threshold_merge_same_level_peaks():
    """Two local maxima separated by a saddle within one quantization level
    must merge (sep deblend_nthresh semantics); well-separated peaks must
    not."""
    img = _field(noise=0.002)
    _add_gauss(img, 60.0, 60.0, 2.0)
    _add_gauss(img, 60.0, 67.0, 1.9)
    # with very few levels, the peak/saddle gap quantizes away -> merge;
    # the reference's 64 levels resolve it -> split
    few = detect_sources(img, DetectionConfig(thresh=25.0, deblend_nthresh=2))
    many = detect_sources(img, DetectionConfig(thresh=25.0, deblend_nthresh=64))
    assert len(few["y"]) == 1
    assert len(many["y"]) == 2


def test_deblend_cont_flux_criterion():
    # a faint sub-peak below the contrast floor merges even if separated
    img = _field(noise=0.002)
    _add_gauss(img, 60.0, 60.0, 30.0, sigma=2.0)
    _add_gauss(img, 60.0, 68.0, 0.35, sigma=1.2)
    lo = detect_sources(img, DetectionConfig(thresh=25.0, deblend_cont=1e-5))
    hi = detect_sources(img, DetectionConfig(thresh=25.0, deblend_cont=0.5))
    assert len(hi["y"]) <= len(lo["y"])
    assert len(hi["y"]) == 1


def test_batched_sparse_download_matches_dense():
    """detect_sources_batched ships masked pixels as device-compacted COO
    triples (ops/detection.py _compact_masked); results must be
    bit-identical to the per-tile dense path, including on tiles whose
    masked-pixel count overflows the compaction buffer (dense fallback)."""
    from debvader_tpu.ops.detection import _compact_k, detect_sources_batched

    rng = np.random.default_rng(3)
    sparse_tile = _field(256, noise=0.01, back=0.0, seed=3)
    for _ in range(6):
        cy, cx = rng.integers(12, 244, 2)
        _add_gauss(sparse_tile, cy, cx, rng.uniform(0.5, 2.0))
    # nearly-all-bright tile: masked count far exceeds _compact_k(256)
    dense_tile = sparse_tile + 5.0 * np.abs(
        rng.normal(size=(256, 256)).astype(np.float32)
    )
    tiles = np.stack([sparse_tile, dense_tile])
    cfg = DetectionConfig()
    batched = detect_sources_batched(tiles, cfg)
    assert (batched[1]["labels"] >= 0).sum() > _compact_k(256)  # overflow hit
    for i in range(2):
        single = detect_sources(tiles[i], cfg)
        np.testing.assert_array_equal(single["labels"], batched[i]["labels"])
        np.testing.assert_allclose(single["y"], batched[i]["y"])
        np.testing.assert_allclose(single["x"], batched[i]["x"])
        np.testing.assert_allclose(single["flux"], batched[i]["flux"])


def test_batched_want_map_false_catalog_identical():
    """want_map=False skips only the dense label rebuild: catalogs equal,
    labels None (the tiled survey driver's catalog-only mode)."""
    from debvader_tpu.ops.detection import detect_sources_batched

    rng = np.random.default_rng(7)
    tile = _field(256, noise=0.01, back=0.0, seed=11)
    for _ in range(8):
        cy, cx = rng.integers(12, 244, 2)
        _add_gauss(tile, cy, cx, rng.uniform(0.5, 2.0))
    tiles = np.stack([tile, tile[::-1].copy()])
    cfg = DetectionConfig()
    full = detect_sources_batched(tiles, cfg)
    lean = detect_sources_batched(tiles, cfg, want_map=False)
    for a, b in zip(full, lean):
        assert b["labels"] is None
        for k in ("y", "x", "area", "flux", "peak_yx"):
            np.testing.assert_array_equal(a[k], b[k])

    # the single-tile entry point honors the same flag (it also backs
    # detect_sources_batched's int32-COO-overflow per-tile fallback, which
    # must not silently restore the dense rebuild)
    from debvader_tpu.ops.detection import detect_sources

    t = {}
    one = detect_sources(tile, cfg, timings=t, want_map=False)
    assert one["labels"] is None
    np.testing.assert_array_equal(one["y"], full[0]["y"])
    np.testing.assert_array_equal(one["flux"], full[0]["flux"])
    assert "merge" in t  # the postprocess stages landed in the dict


def test_detection_degenerate_fields():
    """Constant, pure-noise, and NaN-contaminated fields must not crash and
    must behave sensibly (no sources on a constant field; NaN regions are
    simply undetectable — comparisons with NaN are False)."""
    cfg = DetectionConfig()
    const = np.full((96, 96), 3.0, np.float32)
    assert len(detect_objects(const, cfg)) == 0

    noise = _field(96, noise=0.01, back=0.0, seed=9)
    out = detect_objects(noise, cfg)
    assert out.shape[1:] == (2,)  # whatever noise peaks pass, shape holds

    withnan = _field(96, noise=0.01, back=0.0, seed=10)
    _add_gauss(withnan, 30.0, 30.0, 5.0)
    withnan[60:70, 60:70] = np.nan
    res = detect_sources(withnan, cfg)
    assert np.isfinite(res["y"]).all() and np.isfinite(res["x"]).all()
    # the real source is still found
    d = np.hypot(res["y"] - 30.0, res["x"] - 30.0)
    assert d.min() < 1.5


def test_sigma_clip_sort_once_matches_naive():
    """_sigma_clipped_stats sorts each box once and runs the clip
    iterations as value-interval range statistics; this pins it against the
    naive formulation (mask recomputed per iteration, re-sorted median) on
    outlier-contaminated, partially-masked, fully-masked and all-zero boxes
    (the empty-clip resurrection quirk)."""
    import jax
    import jax.numpy as jnp

    from debvader_tpu.ops.detection import _masked_median, _sigma_clipped_stats

    def naive(boxes, iters=3, valid=None):
        mask = valid if valid is not None else jnp.ones_like(boxes)
        for _ in range(iters + 1):
            cnt = jnp.maximum(mask.sum(-1), 1.0)
            mean = (boxes * mask).sum(-1) / cnt
            var = (jnp.square(boxes - mean[..., None]) * mask).sum(-1) / cnt
            std = jnp.sqrt(var)
            med = _masked_median(boxes, mask)
            new = jnp.abs(boxes - med[..., None]) <= 3.0 * std[..., None] + 1e-12
            mask = new.astype(jnp.float32) * (
                valid if valid is not None else jnp.ones_like(boxes)
            )
        return mean, med, std

    rng = np.random.default_rng(0)
    for trial in range(4):
        g, p = 6, 128
        data = rng.normal(3.0, 0.05, size=(g, g, p)).astype(np.float32)
        hot = rng.random((g, g, p)) < 0.02
        data[hot] += rng.uniform(1, 30, hot.sum()).astype(np.float32)
        valid = (rng.random((g, g, p)) > (0.3 if trial % 2 else 0.0)).astype(
            np.float32
        )
        if trial == 2:
            valid[0, 0, :] = 0  # fully-masked box
        if trial == 3:
            data[1, 1, :] = 0.0  # all-zero box
        b = jnp.asarray(np.where(valid > 0, data, 0.0))
        v = jnp.asarray(valid)
        want = jax.device_get(naive(b, valid=v))
        got = jax.device_get(_sigma_clipped_stats(b, valid=v))
        for name, x1, x2 in zip(("mean", "med", "std"), want, got):
            np.testing.assert_allclose(x2, x1, atol=5e-5, err_msg=f"{trial}/{name}")


def test_background_gap_boxes_filled_from_valid():
    """A chip gap covering whole background boxes must not drag the mesh or
    the global estimates toward 0 (gap boxes are filled with the median of
    boxes that have data, like sep's masked-cell interpolation)."""
    import jax
    import jax.numpy as jnp

    from debvader_tpu.ops.detection import estimate_background

    rng = np.random.default_rng(0)
    img = (3.0 + 0.01 * rng.normal(size=(512, 512))).astype(np.float32)
    img[:, :312] = np.nan  # ~61% gap, entire 64px boxes fully invalid
    back, rms, gb, grms = jax.device_get(
        estimate_background(jnp.asarray(img), box=64)
    )
    assert abs(float(gb) - 3.0) < 0.01
    assert 0.005 < float(grms) < 0.02
    # back map across the valid area (away from the gap edge) reads ~3.0
    assert np.allclose(back[:, 340:], 3.0, atol=0.02)


def test_native_merge_matches_python():
    """The C++ merge core (runtime/segmerge.cpp) is bit-identical to the
    Python reference loop on randomized segment graphs."""
    from debvader_tpu.ops.detection import _merge_segments_py
    from debvader_tpu.runtime.segmerge import merge_segments, native_available

    assert native_available()
    rng = np.random.default_rng(0)
    for trial in range(20):
        L = int(rng.integers(2, 60))
        E = int(rng.integers(1, 4 * L))
        ea = rng.integers(0, L, E)
        eb = rng.integers(0, L, E)
        keep = ea != eb
        ea, eb = np.minimum(ea, eb)[keep].astype(np.int64), np.maximum(ea, eb)[keep].astype(np.int64)
        if len(ea) == 0:
            continue
        eh = rng.uniform(0.1, 5.0, len(ea))
        peak = rng.uniform(0.5, 50.0, L)
        flux = rng.uniform(1.0, 100.0, L)
        order = np.argsort(peak, kind="stable")
        thr = 0.3
        nthr = 64
        cont = float(rng.choice([1e-5, 0.005, 0.1]))
        r_native = merge_segments(ea, eb, eh, peak, flux, order, nthr, thr, cont)
        r_py = _merge_segments_py(ea, eb, eh, peak, flux.copy(), order, nthr, thr, cont)
        np.testing.assert_array_equal(r_native, r_py)


def test_native_merge_on_real_field():
    """End-to-end detect_sources result is identical with and without the
    native merge (monkeypatched off)."""
    from debvader_tpu.ops import detection as det
    from debvader_tpu.runtime import segmerge

    img = _field(128, noise=0.01, back=0.0, seed=11)
    _add_gauss(img, 40.0, 40.0, 5.0)
    _add_gauss(img, 44.0, 43.0, 3.0)
    _add_gauss(img, 90.0, 90.0, 2.0)
    cfg = DetectionConfig(thresh=10.0)
    a = detect_sources(img, cfg)

    real = segmerge.merge_segments
    try:
        segmerge.merge_segments = lambda *args, **kw: None  # force Python path
        # also defeat any caching inside detection
        b = detect_sources(img, cfg)
    finally:
        segmerge.merge_segments = real
    np.testing.assert_array_equal(a["labels"], b["labels"])
    np.testing.assert_array_equal(a["y"], b["y"])


def test_pallas_knob_escape_hatches(monkeypatch):
    """Explicitly disabled Pallas kernels stay disabled on every path.

    Regression for two round-3 review findings: (a) the batched path
    auto-upgraded use_pallas_filter into the fused kernel even when the
    caller set use_pallas_fused=False; (b) _fused_enabled's auto mode
    ignored use_pallas_select=False although the fused core feeds
    label_select_fixpoint."""
    from debvader_tpu.ops.detection import _fused_enabled, _normalize_batched_cfg

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # auto mode respects the label_select escape hatch
    assert _fused_enabled(DetectionConfig()) is True
    assert _fused_enabled(DetectionConfig(use_pallas_select=False)) is False
    # explicit force still wins (user asked for the fused core by name)
    assert _fused_enabled(
        DetectionConfig(use_pallas_select=False, use_pallas_fused=True)
    ) is True

    # on TPU with fused auto-on, the batched path needs no rewrite (the
    # fused stack already subsumes the single-field filter)
    same = _normalize_batched_cfg(DetectionConfig(use_pallas_filter=True))
    assert _fused_enabled(same)

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")

    # off-TPU the fused core is forced on (interpret mode) rather than
    # de-batching into the single-field filter...
    up = _normalize_batched_cfg(DetectionConfig(use_pallas_filter=True))
    assert up.use_pallas_fused is True and not up.use_pallas_filter
    # ...but an explicit opt-out of the fused kernel or its select feeder
    # is honored: run the XLA filter batched instead
    held = _normalize_batched_cfg(
        DetectionConfig(use_pallas_filter=True, use_pallas_fused=False)
    )
    assert held.use_pallas_fused is False and not held.use_pallas_filter
    held2 = _normalize_batched_cfg(
        DetectionConfig(use_pallas_filter=True, use_pallas_select=False)
    )
    assert held2.use_pallas_fused is None and not held2.use_pallas_filter


def test_saddle_edges_coo_matches_dense_bruteforce():
    """_saddle_edges_coo must reproduce the dense 4-direction slice
    extraction exactly — including the column-wrap traps where idx+1 /
    idx+f-1 / idx+f+1 land on the next row — on adversarial random masks
    (checked as the per-pair scatter-max the merge consumes, which is
    order-independent)."""
    from debvader_tpu.ops.detection import _saddle_edges_coo

    rng = np.random.default_rng(23)
    for f, density in [(16, 0.9), (32, 0.3), (24, 0.05), (8, 1.0)]:
        labels = np.full((f, f), -1, np.int64)
        mask = rng.random((f, f)) < density
        # labels are arbitrary flat "peak" ids, many duplicates
        labels[mask] = rng.integers(0, f * f, mask.sum())
        filt = rng.normal(size=(f, f)).astype(np.float32)

        # dense brute force over all 4 unordered neighbor directions
        pairs = {}
        for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
            for y in range(f):
                for x in range(f):
                    y2, x2 = y + dy, x + dx
                    if not (0 <= y2 < f and 0 <= x2 < f):
                        continue
                    la, lb = labels[y, x], labels[y2, x2]
                    if la < 0 or lb < 0 or la == lb:
                        continue
                    key = (min(la, lb), max(la, lb))
                    h = min(filt[y, x], filt[y2, x2])
                    pairs[key] = max(pairs.get(key, -np.inf), float(h))

        flat = labels.ravel()
        sel = np.flatnonzero(flat >= 0)
        lo, hi, h = _saddle_edges_coo(
            sel.astype(np.int64), flat[sel], filt.ravel()[sel], f
        )
        if lo is None:
            assert not pairs
            continue
        got = {}
        for a, b, hh in zip(lo, hi, h):
            key = (int(a), int(b))
            got[key] = max(got.get(key, -np.inf), float(hh))
        assert got == pairs


def test_rectangular_field_rejected():
    """Non-square fields raise loudly everywhere instead of silently
    mis-tiling: the pipeline's center-offset convention (like the
    reference's) is single-axis, and a rectangular field through the
    tiling grid would drop every source beyond the leading-axis extent."""
    import pytest

    from debvader_tpu.ops.detection import detect_sources, detect_sources_batched
    from debvader_tpu.pipeline.tiles import detect_objects_tiled

    img = np.zeros((96, 160), np.float32)
    with pytest.raises(ValueError, match="square"):
        detect_sources(img, DetectionConfig())
    with pytest.raises(ValueError, match="square"):
        detect_sources_batched(np.stack([img, img]), DetectionConfig())
    with pytest.raises(ValueError, match="square"):
        detect_objects_tiled(img, DetectionConfig(), tile=64, overlap=32)


# ---------------------------------------------------------------- lutz tree


def test_lutz_documented_criteria():
    """deblend_algo='lutz' (the sep-faithful multi-threshold component
    tree, runtime/segmerge.cpp dvm_lutz) honors the documented SExtractor
    criteria: close peaks whose separation quantizes away at few levels
    merge, 64 levels split them; a companion below the contrast floor
    merges regardless of separation."""
    img = _field(noise=0.002, back=0.0)
    _add_gauss(img, 60.0, 60.0, 2.0, sigma=2.0)
    _add_gauss(img, 60.0, 67.0, 1.9, sigma=2.0)
    few = detect_sources(
        img, DetectionConfig(thresh=25.0, deblend_nthresh=2, deblend_algo="lutz")
    )
    many = detect_sources(
        img, DetectionConfig(thresh=25.0, deblend_nthresh=64, deblend_algo="lutz")
    )
    assert len(few["y"]) == 1
    assert len(many["y"]) == 2
    assert np.allclose(sorted(many["x"]), [60, 67], atol=1.0)

    img2 = _field(noise=0.002, back=0.0)
    _add_gauss(img2, 60.0, 60.0, 30.0, sigma=2.0)
    _add_gauss(img2, 60.0, 68.0, 0.35, sigma=1.2)
    hi = detect_sources(
        img2, DetectionConfig(thresh=25.0, deblend_cont=0.5, deblend_algo="lutz")
    )
    assert len(hi["y"]) == 1


def test_lutz_gatherup_assigns_all_pixels():
    """A genuinely blended pair splits into two objects whose joint pixel
    set covers the island (gatherup leaves nothing unassigned) and whose
    centroids recover both truth positions."""
    img = _field(noise=0.002, back=0.0)
    _add_gauss(img, 60.0, 58.0, 3.0, sigma=2.0)
    _add_gauss(img, 60.0, 70.0, 2.5, sigma=2.0)
    out = detect_sources(
        img, DetectionConfig(thresh=25.0, deblend_algo="lutz")
    )
    assert len(out["y"]) == 2
    xs = np.sort(out["x"])
    assert abs(xs[0] - 58) < 1.0 and abs(xs[1] - 70) < 1.0
    # the label map covers the island's full area across the two objects
    lab = out["labels"]
    assert (lab >= 0).sum() == out["area"].sum()


def test_lutz_dc2_field_matches_watershed_catalog():
    """On the real DC2 field the Lutz tree produces a slightly SMALLER
    catalog than the watershed+merge default (it merges the watershed's
    extra borderline splits — the expected direction of the documented
    divergence, PARITY.md), with coincident centroids for the matches,
    and is bit-deterministic across runs."""
    field = np.load(
        "/root/reference/src/debvader/data/dc2_imgs/field/field_img_2.npy"
    )
    w = detect_objects(field, DetectionConfig())
    l1 = detect_objects(field, DetectionConfig(deblend_algo="lutz"))
    l2 = detect_objects(field, DetectionConfig(deblend_algo="lutz"))
    np.testing.assert_array_equal(l1, l2)
    assert 0.85 * len(w) <= len(l1) <= len(w)
    d = np.sqrt(((l1[:, None, :] - w[None, :, :]) ** 2).sum(-1)).min(axis=1)
    assert np.median(d) < 0.5


def test_lutz_config_validation():
    with pytest.raises(ValueError, match="deblend_algo"):
        DetectionConfig(deblend_algo="sep")
