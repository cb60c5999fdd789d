"""Scene-pipeline tests: DeblendField batched deblending, residual and
predicted field assembly, cuts, position optimization hook, iterative loop
termination, and the DC2 end-to-end slice with truth centers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.config import ModelConfig, PipelineConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.pipeline.field import DeblendField
from debvader_tpu.pipeline.iterative import IterativeDeblendField

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))


@pytest.fixture(scope="module")
def tiny_net():
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    return model, variables


def _tiny_field(f=61, bands=3, n_src=3, seed=0):
    rng = np.random.default_rng(seed)
    field = 0.01 * rng.normal(size=(1, f, f, bands)).astype(np.float32)
    yy, xx = np.mgrid[:f, :f]
    centers = []
    for _ in range(n_src):
        cy, cx = rng.integers(15, f - 15, size=2)
        amp = rng.uniform(1, 3)
        blob = amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
        field[0] += blob[:, :, None]
        centers.append((cy - f // 2, cx - f // 2))
    return field, np.asarray(centers, np.float32)


def _pipe_cfg():
    return PipelineConfig(cutout_size=23, nb_of_bands=3, epistemic_samples=8)


def test_deblend_field_shapes_and_recarray(tiny_net):
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(centers)
    assert len(res) == len(centers)
    names = res.dtype.names
    for col in (
        "cutout_images", "output_images_mean", "output_images_stddev",
        "shifts", "list_idx", "galaxy_distances_to_center_x",
        "galaxy_distances_to_center_y", "epistemic_uncertainty", "passed_cuts",
    ):
        assert col in names
    assert res[0]["output_images_mean"].shape == (23, 23, 3)
    assert df.nb_of_detected_objects == [3]
    assert df.nb_of_deblended_galaxies == [3]


def test_deblend_field_chunked_matches_unchunked(tiny_net):
    """Survey-scale chunking (cfg.source_chunk) must produce the identical
    recarray — same order, values, global list_idx — and one counter entry."""
    field, centers = _tiny_field(f=101, n_src=7, seed=3)
    kw = dict(cutout_size=23, nb_of_bands=3)
    ref = DeblendField(tiny_net, field, cfg=_pipe_cfg(), **kw)
    res_ref = ref.deblend_field(centers)
    small = PipelineConfig(cutout_size=23, nb_of_bands=3, epistemic_samples=8,
                           source_chunk=3)
    chunked = DeblendField(tiny_net, field, cfg=small, **kw)
    res_chk = chunked.deblend_field(centers)
    assert len(res_chk) == len(res_ref)
    np.testing.assert_array_equal(
        np.asarray(list(res_chk.list_idx)), np.asarray(list(res_ref.list_idx))
    )
    # deterministic columns match exactly; means are sampled-latent
    # stochastic (rng advances differently per chunk), check finiteness
    for col in ("cutout_images", "shifts"):
        a = np.stack(list(res_ref[col]))
        b = np.stack(list(res_chk[col]))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
    assert np.isfinite(np.stack(list(res_chk.output_images_mean))).all()
    assert chunked.nb_of_detected_objects == [7]
    assert chunked.nb_of_deblended_galaxies == [7]
    # rendering consumes the merged recarray
    resid = chunked.get_residual_field(res_chk)
    assert np.isfinite(resid).all()


def test_deblend_field_border_sources_dropped(tiny_net):
    field, _ = _tiny_field()
    centers = np.array([[0.0, 0.0], [100.0, 100.0]], np.float32)  # 2nd off-field
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(centers)
    assert len(res) == 1
    assert list(res["list_idx"]) == [0]


def test_deblend_field_all_border_returns_none_dict(tiny_net):
    field, _ = _tiny_field()
    centers = np.array([[100.0, 100.0]], np.float32)
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(centers)
    assert isinstance(res, dict) and res["list_idx"] is None


def test_deblend_field_with_provided_cutouts(tiny_net):
    field, centers = _tiny_field()
    from debvader_tpu.ops.extraction import extract_cutouts

    cutouts, valid = extract_cutouts(field, 61, centers, 23, 3)
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(centers, cutout_images=np.asarray(cutouts))
    assert len(res) == len(centers)


def test_residual_and_predicted_fields(tiny_net):
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    df.deblend_field(centers)
    resid = df.get_residual_field()
    assert resid.shape == field.shape
    pred = df.get_predicted_field()
    assert pred["predicted_mean_field"].shape == (61, 61, 3)
    # residual + rendered prediction == original field
    np.testing.assert_allclose(
        resid[0] + pred["predicted_mean_field"], field[0], atol=1e-4
    )
    meta = df.get_deblending_meta_data()
    for k in (
        "field_image", "deblended_image", "predicted_mean_field",
        "predicted_stddev_field", "predicted_epistemic_field",
    ):
        assert k in meta


def test_epistemic_estimation(tiny_net):
    field, centers = _tiny_field()
    df = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3,
        epistemic_uncertainty_estimation=True, cfg=_pipe_cfg(),
    )
    res = df.deblend_field(centers)
    epi = np.stack([np.asarray(r["epistemic_uncertainty"]) for r in res])
    assert epi.shape == (3, 23, 23, 3)
    assert epi.std() > 0  # sampled latents give nonzero spread


def test_mse_criterion_cuts(tiny_net):
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(centers, mse_criterion=0.0)  # everything fails
    assert not any(res["passed_cuts"])
    res = df.deblend_field(centers, mse_criterion=1e9)
    assert all(res["passed_cuts"])


def test_optimise_positions_runs(tiny_net):
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(centers, optimise_positions=True)
    shifts = np.stack(list(res["shifts"]))
    assert shifts.shape == (3, 2)
    assert (np.abs(shifts) <= 3.0 + 1e-6).all()


def test_normalise_path(tiny_net):
    field, centers = _tiny_field()
    df = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, normalise=True, cfg=_pipe_cfg()
    )
    res = df.deblend_field(centers)
    assert np.isfinite(np.stack(list(res["output_images_mean"]))).all()


def test_iterative_deblending_terminates(tiny_net):
    field, centers = _tiny_field(n_src=4, seed=3)
    idf = IterativeDeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg()
    )
    res = idf.iterative_deblending(galaxy_distances_to_center=centers)
    assert res is not None
    assert len(idf.mse) >= 1
    # one list_idx per accumulated row, offset by prior step counts
    # (reference semantics allow collisions when border sources drop,
    # iterative_deblender.py:145-147)
    idx = list(res["list_idx"])
    assert len(idx) == len(res)
    assert all(i >= 0 for i in idx)


def test_iterative_empty_field_converges(tiny_net):
    rng = np.random.default_rng(0)
    field = 0.001 * rng.normal(size=(1, 61, 61, 3)).astype(np.float32)
    idf = IterativeDeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg()
    )
    res = idf.iterative_deblending(galaxy_distances_to_center=np.zeros((0, 2)))
    # nothing to deblend: returns whatever res_deblend is (None) without crash
    assert res is None or res is idf.res_deblend


@pytest.mark.slow
def test_dc2_field_end_to_end_slice():
    """BASELINE.json config 1: extract + deblend the bundled DC2 field with
    truth-catalog centers, full-size model (random weights — the bundled
    checkpoint's data shard is stripped from the snapshot)."""
    field = np.load(
        "/root/reference/src/debvader/data/dc2_imgs/field/field_img_2.npy"
    )
    truth = np.load(
        "/root/reference/src/debvader/data/dc2_imgs/field/"
        "gal_coordinates_complete_truth_catalog_2.npy"
    )
    center = np.load(
        "/root/reference/src/debvader/data/dc2_imgs/field/field_center_2.npy"
    )
    offsets = (truth - center)[:, [1, 0]]  # truth is (x, y) global

    model = DeblenderVAE(ModelConfig())
    variables = init_vae(model, jax.random.PRNGKey(0))
    df = DeblendField((model, variables), field)
    res = df.deblend_field(offsets)
    assert len(res) > 0
    resid = df.get_residual_field()
    assert resid.shape == field.shape
    assert np.isfinite(resid).all()


def test_deblend_field_mesh_sharded(tiny_net):
    """Mesh-sharded inference fan-out over the 8-device CPU mesh matches
    shapes/finite output of the single-device path."""
    from debvader_tpu.parallel import make_mesh

    field, centers = _tiny_field()
    mesh = make_mesh()
    df = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(), mesh=mesh
    )
    res = df.deblend_field(centers)
    assert len(res) == len(centers)
    means = np.stack(list(res["output_images_mean"]))
    assert means.shape == (3, 23, 23, 3) and np.isfinite(means).all()
    resid = df.get_residual_field()
    assert np.isfinite(resid).all()


def test_iterative_cumulative_residual(tiny_net):
    """cumulative_residual=True subtracts every galaxy found so far; the
    final residual should therefore have less flux than the original field
    around every detected source."""
    field, centers = _tiny_field(n_src=4, seed=5)
    idf = IterativeDeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg()
    )
    res = idf.iterative_deblending(
        galaxy_distances_to_center=centers, cumulative_residual=True
    )
    assert res is not None and len(res) >= len(centers)
    resid = idf.get_residual_field(res_deblend=res)
    assert np.isfinite(resid).all()


def test_deblend_field_with_measurements(tiny_net):
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(centers, measure=True)
    for col in ("flux", "centroid", "ellipticity", "snr"):
        assert col in res.dtype.names
    assert np.asarray(res[0]["flux"]).shape == (3,)
    assert np.asarray(res[0]["ellipticity"]).shape == (3, 2)
    assert np.isfinite(np.asarray(res[0]["snr"])).all()


def test_deblend_and_render_matches_two_stage_path(tiny_net):
    """The fused survey driver (stamps never leave the device) must produce
    the same residual as deblend_field + get_residual_field, and a catalog
    carrying the same per-source columns minus the stamp images."""
    field, centers = _tiny_field()
    a = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = a.deblend_field(centers)
    residual_ref = a.get_residual_field(res)

    b = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    catalog, residual = b.deblend_and_render(centers)
    np.testing.assert_allclose(residual, residual_ref, atol=1e-6)
    assert len(catalog) == len(res)
    np.testing.assert_array_equal(catalog.list_idx, res.list_idx)
    np.testing.assert_allclose(
        catalog.galaxy_distances_to_center_x, res.galaxy_distances_to_center_x
    )
    assert "output_images_mean" not in catalog.dtype.names
    assert catalog.passed_cuts.all()

    # chunked streaming (source_chunk=2 forces 2 chunks) renders the same
    # canvas incrementally
    cfg_small = PipelineConfig(cutout_size=23, nb_of_bands=3, source_chunk=2)
    c = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=cfg_small)
    cat2, residual2 = c.deblend_and_render(centers)
    assert len(cat2) == len(res)
    assert residual2.shape == field.shape
    assert np.isfinite(residual2).all()

    # return_model: field == residual + model wherever stamps landed
    d = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    _, residual3, model = d.deblend_and_render(centers, return_model=True)
    np.testing.assert_allclose(residual3[0] + model, field[0], atol=1e-5)


def test_deblend_and_render_transfer_dtype(tiny_net):
    """transfer_dtype downloads the residual/model at reduced precision:
    results match the full-precision run to bf16/f16 rounding, the
    returned arrays keep the field's dtype, and the option threads
    through the iterative driver."""
    field, centers = _tiny_field()
    a = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    _, residual_ref, model_ref = a.deblend_and_render(centers, return_model=True)

    b = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    cat, residual_bf, model_bf = b.deblend_and_render(
        centers, return_model=True, transfer_dtype="bfloat16"
    )
    assert residual_bf.dtype == field.dtype and model_bf.dtype == field.dtype
    scale = np.abs(residual_ref).max()
    # bf16 has an 8-bit significand: elementwise error bounded by ~2^-8
    # of each value, so ~scale/256 overall
    assert np.abs(residual_bf - residual_ref).max() <= scale / 128
    assert np.abs(model_bf - model_ref).max() <= max(np.abs(model_ref).max(), 1) / 128
    assert len(cat) == len(centers)

    c = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    _, residual_f16 = c.deblend_and_render(centers, transfer_dtype="float16")
    assert np.abs(residual_f16 - residual_ref).max() <= scale / 512

    from debvader_tpu.config import DetectionConfig

    d = IterativeDeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg()
    )
    det_cfg = DetectionConfig(thresh=25.0, threshold_scaling="matched")
    _, resid_it = d.iterative_deblend_and_render(
        det_cfg=det_cfg, transfer_dtype="bfloat16"
    )
    assert resid_it.dtype == field.dtype
    assert np.isfinite(resid_it).all()


def test_deblend_and_render_measure_and_epistemic(tiny_net):
    field, centers = _tiny_field()
    df = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3,
        epistemic_uncertainty_estimation=True, cfg=_pipe_cfg(),
    )
    catalog, residual = df.deblend_and_render(centers, measure=True)
    for col in ("flux", "centroid", "ellipticity", "snr", "epistemic_norm"):
        assert col in catalog.dtype.names
    assert (catalog.epistemic_norm > 0).all()
    assert np.isfinite(residual).all()


def test_deblend_and_predict_matches_contract_path(tiny_net):
    """The streaming predicted-field driver must reproduce the contract
    path's canvases (deblend_field + get_predicted_field +
    get_residual_field) without any stamp download; epistemic canvas only
    when the pipeline estimates epistemic uncertainty."""
    field, centers = _tiny_field()
    for epistemic in (False, True):
        a = DeblendField(
            tiny_net, field, cutout_size=23, nb_of_bands=3,
            epistemic_uncertainty_estimation=epistemic, cfg=_pipe_cfg(),
        )
        res = a.deblend_field(centers)
        pred_ref = a.get_predicted_field(res)
        residual_ref = a.get_residual_field(res)

        b = DeblendField(
            tiny_net, field, cutout_size=23, nb_of_bands=3,
            epistemic_uncertainty_estimation=epistemic, cfg=_pipe_cfg(),
        )
        t = {}
        catalog, fields = b.deblend_and_predict(centers, timings=t)
        assert len(catalog) == len(res)
        np.testing.assert_allclose(
            fields["residual_field"], residual_ref, atol=1e-6
        )
        np.testing.assert_allclose(
            fields["predicted_mean_field"],
            pred_ref["predicted_mean_field"],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            fields["predicted_stddev_field"],
            pred_ref["predicted_stddev_field"],
            atol=1e-6,
        )
        if epistemic:
            # the two drivers draw their Monte-Carlo replicas with
            # different chunk structure (the stream pads sources to the
            # forward bucket), so the std maps are independent estimates
            # of the same quantity: same support, sums statistically equal
            epi_s = fields["predicted_epistemic_field"]
            epi_r = pred_ref["predicted_epistemic_field"]
            # std-of-8 estimates vary ~50% per pixel, but sums over the
            # thousands of supported pixels concentrate
            assert 0.7 < epi_s.sum() / epi_r.sum() < 1.3
            assert epi_s.min() > -1e-6  # nonneg up to interp float noise
            # epistemic mass only under rendered footprints
            off_support = fields["predicted_mean_field"] == 0
            assert np.all(np.abs(epi_s[off_support]) < 1e-6)
        else:
            assert fields["predicted_epistemic_field"] is None
        assert set(t) == {"upload", "deblend_render", "field_download"}

    # no-sources early exit: zero canvases, catalog None
    c = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg()
    )
    far = np.asarray([[500.0, 500.0]], np.float32)
    cat_none, fields0 = c.deblend_and_predict(far)
    assert cat_none is None
    assert (fields0["predicted_mean_field"] == 0).all()
    np.testing.assert_array_equal(fields0["residual_field"], c.field_image)


def test_deblend_and_predict_transfer_dtype(tiny_net):
    """Reduced-precision download applies to all predicted canvases and
    restores the field dtype on host."""
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    _, ref = df.deblend_and_predict(centers)
    df2 = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    _, red = df2.deblend_and_predict(centers, transfer_dtype="bfloat16")
    for k in ("residual_field", "predicted_mean_field", "predicted_stddev_field"):
        assert red[k].dtype == ref[k].dtype
        scale = max(1.0, float(np.abs(ref[k]).max()))
        assert np.max(np.abs(red[k] - ref[k])) / scale < 2e-2


def test_device_dtype_reduced_residency(tiny_net):
    """device_dtype='bfloat16' keeps the memoized field + render canvases
    at half precision on device (the HBM-capacity knob that lets 16k
    coadds serve on one 16 GB chip); results match full precision at the
    ~3-significant-digit level and per-chunk compute stays float32."""
    import jax.numpy as jnp

    field, centers = _tiny_field()
    ref_df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    _, residual_ref = ref_df.deblend_and_render(centers)
    res_ref = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg()
    ).deblend_field(centers)

    df = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(),
        device_dtype="bfloat16",
    )
    assert df._device_field(df.field_image).dtype == jnp.bfloat16
    cat, residual = df.deblend_and_render(centers)
    assert residual.dtype == np.float32
    scale = float(np.abs(residual_ref).max())
    assert np.max(np.abs(residual - residual_ref)) / scale < 2e-2
    assert len(cat) == len(res_ref)

    # contract path on the reduced-resident field
    df2 = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(),
        device_dtype="bfloat16",
    )
    res2 = df2.deblend_field(centers)
    assert len(res2) == len(res_ref)
    m_ref = np.stack(list(res_ref.output_images_mean))
    m2 = np.stack(list(res2.output_images_mean))
    ms = max(1.0, float(np.abs(m_ref).max()))
    assert np.max(np.abs(m2 - m_ref)) / ms < 2e-2

    # predicted canvases at reduced residency
    df3 = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(),
        device_dtype="bfloat16",
    )
    _, fields = df3.deblend_and_predict(centers)
    for k in ("residual_field", "predicted_mean_field", "predicted_stddev_field"):
        assert fields[k].dtype == np.float32
        assert np.isfinite(fields[k]).all()

    # iterative serving holds the running residual at bf16
    from debvader_tpu.config import DetectionConfig

    idf = IterativeDeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(),
        device_dtype="bfloat16",
    )
    det_cfg = DetectionConfig(thresh=25.0, threshold_scaling="matched")
    _, resid_it = idf.iterative_deblend_and_render(det_cfg=det_cfg, max_iterations=2)
    assert resid_it.dtype == np.float32 and np.isfinite(resid_it).all()

    # float16 residency is rejected outright: the canvases accumulate
    # scatter-add sums and float16 clips at 65504
    with pytest.raises(ValueError, match="float16"):
        DeblendField(
            tiny_net, field, cutout_size=23, nb_of_bands=3,
            device_dtype="float16",
        )
    # conflicting explicit upload_dtype is rejected; matching is accepted
    with pytest.raises(ValueError, match="conflicts"):
        DeblendField(
            tiny_net, field, cutout_size=23, nb_of_bands=3,
            device_dtype="bfloat16", upload_dtype="float16",
        )
    DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3,
        device_dtype="bfloat16", upload_dtype="bfloat16",
    )

    # halved residency at least doubles the HBM chunk budget; at 20k the
    # float32 residency (20 GB) exceeds the chip outright while bfloat16
    # (10 GB) still leaves room for full chunks
    from debvader_tpu.pipeline.field import _serving_chunk_cap

    hbm = 16 << 30
    for f in (12288, 16384, 20480):
        assert _serving_chunk_cap(f, 6, hbm, bytes_per_el=2) >= (
            _serving_chunk_cap(f, 6, hbm, bytes_per_el=4)
        )
    assert _serving_chunk_cap(20480, 6, hbm, bytes_per_el=2) > (
        _serving_chunk_cap(20480, 6, hbm, bytes_per_el=4)
    )


def test_iterative_deblend_and_render_streaming(tiny_net):
    """The device-resident iterative driver detects on the running device
    residual, accumulates a catalog with an iteration column, and
    terminates by the reference's strictly-more rule (plus zero-detection
    exit)."""
    from debvader_tpu.config import DetectionConfig

    field, centers = _tiny_field()
    df = IterativeDeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg()
    )
    det_cfg = DetectionConfig(thresh=25.0, threshold_scaling="matched")
    catalog, residual = df.iterative_deblend_and_render(det_cfg=det_cfg)
    assert residual.shape == field.shape
    assert np.isfinite(residual).all()
    if catalog is not None:
        assert "iteration" in catalog.dtype.names
        assert catalog.iteration.min() == 0
        assert len(catalog) == sum(df.nb_of_deblended_galaxies)
        # list_idx offsets are cumulative and unique within an iteration
        it0 = catalog[catalog.iteration == 0]
        assert len(set(it0.list_idx)) == len(it0)

    # seeding step 0 with known centers reproduces deblend_and_render's
    # first-step residual when later steps find nothing
    df2 = IterativeDeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg()
    )
    cat2, res2 = df2.iterative_deblend_and_render(
        galaxy_distances_to_center=centers,
        det_cfg=DetectionConfig(thresh=1e6, threshold_scaling="matched"),
        max_iterations=1,
    )
    df3 = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    cat3, res3 = df3.deblend_and_render(centers)
    np.testing.assert_allclose(res2, res3, atol=1e-6)
    assert len(cat2) == len(cat3)


def test_device_field_cache_invalidates_on_mutation(tiny_net):
    """In-place edits of field_image — even a single pixel — must
    invalidate the memoized device copy (keyed on identity + full
    content checksum), not silently reuse it.  NaN-bearing fields must
    still key equal to themselves (cache hit)."""
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    dev1 = df._device_field(df.field_image)
    dev1b = df._device_field(df.field_image)
    assert dev1 is dev1b  # unchanged -> memoized
    df.field_image[0, 7, 11, 1] += 0.5  # single-pixel edit
    dev2 = df._device_field(df.field_image)
    assert dev2 is not dev1
    np.testing.assert_allclose(
        np.asarray(dev2)[0, 7, 11, 1], df.field_image[0, 7, 11, 1], rtol=1e-6
    )
    df.field_image[0, 2, 2, :] = np.nan  # gap pixels: memo must still hit
    dev3 = df._device_field(df.field_image)
    dev3b = df._device_field(df.field_image)
    assert dev3 is dev3b


def test_render_cache_invalidates_on_stamp_edit(tiny_net):
    """Editing stamp columns of the returned recarray in place must be
    honored by the next render: the device-resident render cache is keyed
    on content (per-column checksum), not recarray identity alone
    (ADVICE r2 / VERDICT r3 weak #4 — the failure mode was silent stale
    residuals)."""
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(centers)
    assert df._render_cache is not None  # cache active for this size
    base = df.get_residual_field(res)
    # Unchanged recarray -> cache still serves (and renders identically).
    np.testing.assert_array_equal(df.get_residual_field(res), base)
    # Mask one source's mean stamp; the re-render must observe it:
    # subtracting a zero stamp returns that source's flux to the residual.
    # (The stamp cells hold read-only device-array views, so the edit is a
    # cell replacement — the recarray identity is unchanged either way.)
    res[1]["output_images_mean"] = np.zeros_like(
        np.asarray(res[1]["output_images_mean"])
    )
    edited = df.get_residual_field(res)
    assert not np.array_equal(edited, base)
    # The edited render equals a fresh render with the cache dropped.
    df.drop_render_cache()
    np.testing.assert_array_equal(df.get_residual_field(res), edited)


def test_deblend_field_empty_centers(tiny_net):
    field, _ = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res = df.deblend_field(np.zeros((0, 2), np.float32))
    assert isinstance(res, dict) and res["list_idx"] is None
    cat, residual = df.deblend_and_render(np.zeros((0, 2), np.float32))
    assert cat is None
    np.testing.assert_array_equal(residual, field)


def test_serving_with_nan_gap(tiny_net):
    """Sources near a NaN chip gap: the forward sees zero-filled pixels, the
    rendered model/residual stay finite everywhere, and rows whose mse
    window is NaN-free pass cuts (non-finite metrics fail, never pass)."""
    field, centers = _tiny_field()
    field = field.copy()
    field[0, 2:8, 2:8, :] = np.nan  # corner gap away from the sources
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    catalog, residual = df.deblend_and_render(centers)
    assert catalog is not None
    gap_free = np.ones_like(residual, bool)
    gap_free[0, 2:8, 2:8, :] = False
    assert np.isfinite(residual[gap_free]).all()
    assert catalog.passed_cuts.all()


def test_deblend_field_quantized_serving(tiny_net):
    """quantized= routes the batched stamp forward through the int8 PTQ
    path for BOTH drivers (deblend_field and the streaming
    deblend_and_render): results stay close to float serving (int8
    per-channel PTQ error), all sources deblend, and epistemic sampling
    keeps using the float net."""
    from debvader_tpu.models.quantized import quantize_vae

    model, variables = tiny_net
    field, centers = _tiny_field()
    # calibrate on cutouts from the field itself (representative fluxes)
    df0 = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    res_f = df0.deblend_field(centers)
    calib = np.stack(list(res_f.cutout_images))
    qv = quantize_vae(model, variables, calib)

    dfq = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(),
        quantized=qv,
    )
    res_q = dfq.deblend_field(centers)
    assert len(res_q) == len(res_f)
    assert res_q.passed_cuts.all()
    mean_f = np.stack(list(res_f.output_images_mean))
    mean_q = np.stack(list(res_q.output_images_mean))
    assert np.isfinite(mean_q).all()
    # total flux per source close to the float path.  The tolerance is
    # loose because both paths SAMPLE the latent with independent rng
    # streams — the spread here is dominated by posterior sampling
    # variance on an untrained tiny net, not by int8 error (the tight
    # PTQ bound, <=7e-4 flux on trained weights with a shared rng, is
    # pinned in test_quantized.py).
    flux_f = mean_f.sum(axis=(1, 2, 3))
    flux_q = mean_q.sum(axis=(1, 2, 3))
    np.testing.assert_allclose(flux_q, flux_f, rtol=0.3, atol=0.15)

    # streaming driver: same quantized forward, residual finite + close
    dff = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    _, resid_f = dff.deblend_and_render(centers)
    dfq2 = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(),
        quantized=qv,
    )
    cat_q, resid_q = dfq2.deblend_and_render(centers)
    assert cat_q is not None and cat_q.passed_cuts.all()
    assert np.isfinite(resid_q).all()
    scale = np.abs(field).max()
    assert np.abs(resid_q - resid_f).max() <= 0.25 * scale

    # epistemic stays on the float path (runs, positive norms)
    dfe = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(),
        quantized=qv, epistemic_uncertainty_estimation=True,
    )
    cat_e, _ = dfe.deblend_and_render(centers)
    assert (cat_e.epistemic_norm > 0).all()


def test_quantized_mesh_composes(tiny_net):
    """r4: int8 serving composes with the mesh fan-out (the former mutual
    exclusion is lifted — make_sharded_quantized_forward shards the stamp
    batch over 'data' with replicated int8 kernels/scales).  The sharded
    quantized pipeline must reproduce the single-device quantized pipeline
    up to float summation order (deterministic z_mode='mean')."""
    from debvader_tpu.models.quantized import quantize_vae
    from debvader_tpu.parallel.mesh import make_mesh

    model, variables = tiny_net
    field, centers = _tiny_field()
    df0 = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    calib = np.stack(list(df0.deblend_field(centers).cutout_images))
    qv = quantize_vae(model, variables, calib)
    kw = dict(cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(), quantized=qv,
              z_mode="mean")
    _, r_single = DeblendField(tiny_net, field, **kw).deblend_and_render(centers)
    _, r_mesh = DeblendField(
        tiny_net, field, mesh=make_mesh(4), **kw
    ).deblend_and_render(centers)
    np.testing.assert_allclose(r_mesh, r_single, rtol=1e-4, atol=1e-5)


def test_quantized_forward_zeros_nonfinite_before_normalize(tiny_net):
    """Regression: +/-inf pixels must be zeroed BEFORE normalization on the
    quantized serving path, like the float paths — tanh(arcsinh(inf)) = 1.0
    would otherwise slip past the forward's finite guard as maximal signal."""
    from debvader_tpu.models.quantized import quantize_vae

    model, variables = tiny_net
    field, centers = _tiny_field()
    calib = np.zeros((4, 23, 23, 3), np.float32)
    qv = quantize_vae(model, variables, calib)

    cut = np.asarray(
        np.random.default_rng(3).normal(size=(3, 23, 23, 3)), np.float32
    )
    bad = cut.copy()
    bad[0, 5, 5, 0] = np.inf
    bad[1, 7, 2, 1] = -np.inf
    bad[2, 0, 0, 2] = np.nan
    clean = cut.copy()
    clean[0, 5, 5, 0] = 0.0
    clean[1, 7, 2, 1] = 0.0
    clean[2, 0, 0, 2] = 0.0

    def run(x):
        df = DeblendField(
            tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(),
            quantized=qv,
        )
        d = df._batched_forward(jnp.asarray(x))
        return np.asarray(d.loc), np.asarray(d.scale)

    loc_b, scale_b = run(bad)
    loc_c, scale_c = run(clean)
    # both DeblendFields start from PRNGKey(0), so the sampled latents
    # coincide and the guarded forward must match the pre-zeroed one exactly
    np.testing.assert_array_equal(loc_b, loc_c)
    np.testing.assert_array_equal(scale_b, scale_c)
    assert np.isfinite(loc_b).all()


def test_rectangular_field_image_rejected(tiny_net):
    """DeblendField must reject a non-square (or non-4D) field_image loudly
    — extraction's single-axis field_size would otherwise silently drop
    every source beyond the leading-axis extent as a 'border' case."""
    import pytest

    from debvader_tpu.pipeline.field import DeblendField

    with pytest.raises(ValueError, match="square"):
        DeblendField(
            tiny_net, np.zeros((1, 96, 160, 3), np.float32),
            cutout_size=23, nb_of_bands=3,
        )
    with pytest.raises(ValueError, match="square"):
        DeblendField(
            tiny_net, np.zeros((96, 96, 3), np.float32),
            cutout_size=23, nb_of_bands=3,
        )
    # the per-call override must hit the same wall: a rectangular
    # field_image passed to deblend_field would otherwise silently drop
    # every source beyond field_image.shape[1]
    field, centers = _tiny_field()
    df = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    with pytest.raises(ValueError, match="square"):
        df.deblend_field(centers, field_image=np.zeros((1, 96, 160, 3), np.float32))


def test_serving_chunk_cap_scales_with_field():
    """The streaming serving chunk shrinks once the field + render canvas
    claim their HBM share: full default through 8k (measured fitting on a
    16 GB chip), capped at survey scales (8192 OOMed at 12k), always a
    _PADDED_BATCH_BUCKETS value (bucketing pads UP, so a non-bucket cap
    would be undone)."""
    from debvader_tpu.api import _PADDED_BATCH_BUCKETS
    from debvader_tpu.pipeline.field import _serving_chunk_cap

    hbm = 16 << 30
    for f in (259, 4096, 8192):
        assert _serving_chunk_cap(f, 6, hbm) == 8192
    for f in (12288, 16384):
        cap = _serving_chunk_cap(f, 6, hbm)
        assert cap < 8192
        assert cap in _PADDED_BATCH_BUCKETS
    # tiny chips degrade to the smallest bucket, never zero/negative
    assert _serving_chunk_cap(8192, 6, 1 << 30) == _PADDED_BATCH_BUCKETS[0]
    # the iterative driver's budget counts THREE resident full-field
    # buffers (memoized field + running residual + canvas), so its cap
    # can only be <= the one-shot path's at the same field size
    for f in (8192, 12288, 16384):
        assert _serving_chunk_cap(f, 6, hbm, resident_fields=3) <= (
            _serving_chunk_cap(f, 6, hbm)
        )
    assert (
        _serving_chunk_cap(12288, 6, hbm, resident_fields=3)
        in _PADDED_BATCH_BUCKETS
    )
    # extra loop-lifetime buffers (the hoisted float32 registration band
    # under optimise_positions) tighten the budget monotonically and can
    # drop a bucket at survey scale
    for f in (12288, 16384):
        reg = 4 * f * f
        assert _serving_chunk_cap(f, 6, hbm, extra_bytes=reg) <= (
            _serving_chunk_cap(f, 6, hbm)
        )
        assert _serving_chunk_cap(f, 6, hbm, extra_bytes=reg) in (
            _PADDED_BATCH_BUCKETS
        )


def test_model_subtract_donated_matches_plain():
    """The donated iterative-step subtract (k>0) must produce the same
    residual/mse as the canvas-only-donated k==0 flavor — donation is a
    memory optimization, not a semantics change."""
    from debvader_tpu.ops.shift import render_pad
    from debvader_tpu.pipeline.field import (
        _model_subtract,
        _model_subtract_donated,
    )

    rng = np.random.default_rng(3)
    f, b = 31, 2
    pad = render_pad(23, 1)
    residual = rng.normal(size=(1, f, f, b)).astype(np.float32)
    canvas = rng.normal(size=(f + 2 * pad, f + 2 * pad, b)).astype(np.float32)

    r1, m1 = _model_subtract(
        jnp.asarray(residual), jnp.asarray(canvas), pad=pad
    )
    r2, m2 = _model_subtract_donated(
        jnp.asarray(residual), jnp.asarray(canvas), pad=pad
    )
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert float(m1) == float(m2)
    expected = residual[0] - canvas[pad : pad + f, pad : pad + f, :]
    np.testing.assert_allclose(np.asarray(r1)[0], expected, rtol=1e-6)


def test_z_mode_mean_deterministic_serving(tiny_net):
    """z_mode='mean' gives a reproducible forward: two pipelines with
    different rng seeds produce identical residuals (under 'sample' they
    differ), and z_mode is validated."""
    field, centers = _tiny_field()
    kw = dict(cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    a = DeblendField(tiny_net, field, z_mode="mean", rng=jax.random.PRNGKey(1), **kw)
    b = DeblendField(tiny_net, field, z_mode="mean", rng=jax.random.PRNGKey(2), **kw)
    _, res_a = a.deblend_and_render(centers)
    _, res_b = b.deblend_and_render(centers)
    np.testing.assert_array_equal(res_a, res_b)

    s1 = DeblendField(tiny_net, field, rng=jax.random.PRNGKey(1), **kw)
    s2 = DeblendField(tiny_net, field, rng=jax.random.PRNGKey(2), **kw)
    _, r1 = s1.deblend_and_render(centers)
    _, r2 = s2.deblend_and_render(centers)
    assert np.abs(r1 - r2).max() > 0  # sampled latents differ

    with pytest.raises(ValueError, match="z_mode"):
        DeblendField(tiny_net, field, z_mode="bogus", **kw)


def test_mesh_epistemic_samples_under_z_mode_mean(tiny_net):
    """Regression: with mesh + z_mode='mean', epistemic estimation must
    still SAMPLE (a deterministic replica apply collapses the uncertainty
    to exactly zero)."""
    from debvader_tpu.parallel import make_mesh

    field, centers = _tiny_field()
    df = DeblendField(
        tiny_net, field, cutout_size=23, nb_of_bands=3,
        cfg=PipelineConfig(cutout_size=23, nb_of_bands=3, epistemic_samples=8),
        mesh=make_mesh(4), z_mode="mean",
        epistemic_uncertainty_estimation=True,
    )
    res = df.deblend_field(centers)
    epi = np.stack(list(res.epistemic_uncertainty))
    assert np.isfinite(epi).all()
    assert epi.max() > 0, "epistemic collapsed to zero under z_mode='mean'"


def test_quantized_z_mode_mean_deterministic(tiny_net):
    """r4: the quantized serving path honors z_mode='mean' (restriction
    lifted once QAT made int8 science-usable — the distillation objective
    trains at the posterior mean, so deterministic serving is the
    better-matched mode): two pipelines with different rng seeds produce
    identical residuals through the int8 forward."""
    from debvader_tpu.models.quantized import quantize_vae

    model, variables = tiny_net
    field, centers = _tiny_field()
    df0 = DeblendField(tiny_net, field, cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg())
    calib = np.stack(list(df0.deblend_field(centers).cutout_images))
    qv = quantize_vae(model, variables, calib)
    kw = dict(cutout_size=23, nb_of_bands=3, cfg=_pipe_cfg(), quantized=qv,
              z_mode="mean")
    _, r1 = DeblendField(
        tiny_net, field, rng=jax.random.PRNGKey(1), **kw
    ).deblend_and_render(centers)
    _, r2 = DeblendField(
        tiny_net, field, rng=jax.random.PRNGKey(2), **kw
    ).deblend_and_render(centers)
    np.testing.assert_array_equal(r1, r2)
