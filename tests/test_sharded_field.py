"""Row-band sharded survey serving: parity with the single-chip streaming
driver on a virtual CPU mesh (SURVEY.md §4 fake-multi-device trick).

The sharded path must reproduce DeblendField.deblend_and_render's products
— same catalog rows, same residual up to float summation order — with the
field, render canvas and residual sharded over the 'band' axis.  The
forward is made deterministic with z_mode='mean' so the comparison is not
confounded by latent sampling (the two paths consume PRNG keys in
different chunk orders by construction).
"""

import jax
import numpy as np
import pytest

from debvader_tpu.config import ModelConfig, PipelineConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.pipeline.field import DeblendField
from debvader_tpu.pipeline.sharded_field import (
    ShardedFieldDeblender,
    band_halo,
)

TINY = ModelConfig(
    stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3)
)
CS, B, F, D = 23, 3, 192, 4


@pytest.fixture(scope="module")
def tiny_net():
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    return model, variables


def _mesh():
    from debvader_tpu.parallel.mesh import make_mesh

    return make_mesh(D)


def _field(seed=0, n_src=14):
    """A field with sources spread over all four bands, including sources
    near band boundaries (cross-band stamps) and the field border."""
    rng = np.random.default_rng(seed)
    field = 0.01 * rng.normal(size=(1, F, F, B)).astype(np.float32)
    yy, xx = np.mgrid[:F, :F]
    centers = []
    for i in range(n_src):
        if i < 3:  # straddle band boundaries (rows 48, 96, 144)
            cy = 48 * (i + 1) + rng.integers(-2, 3)
            cx = rng.integers(20, F - 20)
        elif i == 3:  # hug the top border (still extraction-valid)
            cy, cx = CS // 2 + 1, rng.integers(20, F - 20)
        else:
            cy, cx = rng.integers(15, F - 15, size=2)
        amp = rng.uniform(1, 3)
        blob = amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
        field[0] += blob[:, :, None].astype(np.float32)
        centers.append((cy - F // 2, cx - F // 2))
    # one border-invalid source the extraction must drop on both paths
    centers.append((-(F // 2) + 2, 0.0))
    return field, np.asarray(centers, np.float32) + rng.uniform(
        -0.4, 0.4, size=(n_src + 1, 2)
    ).astype(np.float32)


def _cfg(**kw):
    return PipelineConfig(cutout_size=CS, nb_of_bands=B, **kw)


def _single(tiny_net, field, centers, **kw):
    df = DeblendField(
        tiny_net, field, cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean",
    )
    return df.deblend_and_render(centers, **kw)


def _sharded(tiny_net, field, centers, **kw):
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean",
    )
    return sf, sf.deblend_and_render(centers, **kw)


def test_sharded_matches_single_device(tiny_net):
    field, centers = _field()
    cat_s, res_s = _single(tiny_net, field, centers)
    sf, (cat_p, res_p) = _sharded(tiny_net, field, centers)

    assert res_p.shape == field.shape
    np.testing.assert_array_equal(cat_p.list_idx, cat_s.list_idx)
    np.testing.assert_allclose(
        cat_p.galaxy_distances_to_center_x, cat_s.galaxy_distances_to_center_x
    )
    np.testing.assert_allclose(cat_p.mse_center, cat_s.mse_center, rtol=1e-4)
    np.testing.assert_array_equal(cat_p.passed_cuts, cat_s.passed_cuts)
    np.testing.assert_allclose(res_p, res_s, atol=2e-5)
    # the sharded outputs really were band-sharded on device
    assert sf.n_bands_mesh == D


def test_sharded_matches_single_device_registered(tiny_net):
    field, centers = _field(seed=3)
    cat_s, res_s = _single(tiny_net, field, centers, optimise_positions=True)
    _, (cat_p, res_p) = _sharded(
        tiny_net, field, centers, optimise_positions=True
    )
    sh_s = np.stack(list(cat_s.shifts))
    sh_p = np.stack(list(cat_p.shifts))
    np.testing.assert_allclose(sh_p, sh_s, atol=2e-3)
    np.testing.assert_allclose(res_p, res_s, atol=2e-4)


def test_sharded_return_model_decomposition(tiny_net):
    field, centers = _field(seed=5)
    _, (cat, residual, model) = _sharded(
        tiny_net, field, centers, return_model=True
    )
    np.testing.assert_allclose(residual[0] + model, field[0], atol=1e-5)


def test_sharded_chunked_stream_matches_one_shot(tiny_net):
    """Forcing multiple chunk steps per band accumulates the same canvas."""
    field, centers = _field(seed=7)
    _, (cat_a, res_a) = _sharded(tiny_net, field, centers)
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean",
    )
    cat_b, res_b = sf.deblend_and_render(centers, source_chunk_per_band=1)
    np.testing.assert_array_equal(cat_a.list_idx, cat_b.list_idx)
    np.testing.assert_allclose(res_a, res_b, atol=2e-5)


def test_sharded_rejects_too_small_field(tiny_net):
    halo = band_halo(CS, 3.0, 1)
    f_small = D * (halo - 1)
    field = np.zeros((1, f_small, f_small, B), np.float32)
    with pytest.raises(ValueError, match="halo"):
        ShardedFieldDeblender(
            tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=_cfg()
        )


def test_sharded_no_sources(tiny_net):
    field, _ = _field(seed=9, n_src=1)
    # only a border-invalid source
    centers = np.asarray([[-(F // 2) + 1, 0.0]], np.float32)
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=_cfg()
    )
    cat, residual = sf.deblend_and_render(centers)
    assert cat is None
    np.testing.assert_array_equal(residual, field)


DET = None  # built lazily to avoid import order issues


def _det_cfg():
    from debvader_tpu.config import DetectionConfig

    return DetectionConfig(thresh=25.0, background_box=32, detection_band=0)


def _bright_field(f=300, bands=3, seed=0):
    rng = np.random.default_rng(seed)
    img = (0.01 * rng.normal(size=(f, f))).astype(np.float32)
    yy, xx = np.mgrid[:f, :f]
    # sources include two hugging band boundaries (rows 75, 150 for D=4)
    srcs = [(60.0, 70.0, 3.0), (76.0, 150.0, 2.5), (151.0, 240.0, 3.5),
            (220.0, 60.0, 3.0)]
    for cy, cx, a in srcs:
        img += (a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.6**2))).astype(np.float32)
    field = np.repeat(img[None, :, :, None], bands, axis=-1)
    centers = np.asarray([(cy - f // 2, cx - f // 2) for cy, cx, _ in srcs], np.float32)
    return field, centers


def _sharded_cfg():
    return PipelineConfig(
        cutout_size=CS, nb_of_bands=B, tile_size=64, tile_overlap=16
    )


def test_sharded_detection_matches_tiled(tiny_net):
    from debvader_tpu.pipeline.tiles import detect_objects_tiled

    field, _ = _bright_field()
    want = detect_objects_tiled(field, _det_cfg(), tile=64, overlap=16)
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B,
        cfg=_sharded_cfg(),
    )
    got = sf.detect_objects(_det_cfg())
    assert len(got) == len(want) == 4
    a = np.asarray(sorted(map(tuple, want)))
    b = np.asarray(sorted(map(tuple, got)))
    np.testing.assert_allclose(a, b, atol=1.0)


def test_sharded_iterative_single_step_matches_one_shot(tiny_net):
    """max_iterations=1 with given centers must equal the one-shot serve:
    validates the fold + subtract + re-halo program against _finish_step."""
    field, centers = _bright_field(seed=2)
    sf1 = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B,
        cfg=_sharded_cfg(), z_mode="mean",
    )
    cat1, res1 = sf1.deblend_and_render(centers)
    sf2 = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B,
        cfg=_sharded_cfg(), z_mode="mean",
    )
    cat2, res2 = sf2.iterative_deblend_and_render(
        centers, max_iterations=1
    )
    np.testing.assert_allclose(res2, res1, atol=2e-5)
    np.testing.assert_array_equal(cat1.list_idx, cat2.list_idx)
    assert (cat2.iteration == 0).all()
    assert len(sf2.mse) == 1 and np.isfinite(sf2.mse[0])


def test_sharded_iterative_detects_and_terminates(tiny_net):
    """Full loop: step-0 detection on the sharded field, then re-detection
    on the sharded residual (random weights leave the sources, so the loop
    terminates on the not-strictly-more rule)."""
    field, _ = _bright_field(seed=4)
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B,
        cfg=_sharded_cfg(), z_mode="mean",
    )
    cat, res = sf.iterative_deblend_and_render(det_cfg=_det_cfg())
    assert cat is not None and "iteration" in cat.dtype.names
    assert res.shape == field.shape and np.isfinite(res).all()
    assert len(sf.mse) >= 1


def test_sharded_measure_matches_single_device(tiny_net):
    field, centers = _field(seed=11)
    df = DeblendField(
        tiny_net, field, cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean",
    )
    cat_s, _ = df.deblend_and_render(centers, measure=True)
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean",
    )
    cat_p, _ = sf.deblend_and_render(centers, measure=True)
    for col in ("flux", "snr"):
        np.testing.assert_allclose(
            np.stack(list(cat_p[col])), np.stack(list(cat_s[col])), rtol=1e-4
        )


def test_sharded_predict_matches_single_device(tiny_net):
    """Deterministic products (mean + aleatoric-stddev canvases, residual)
    must match the single-chip deblend_and_predict; the epistemic canvas is
    sampling-based so it is checked statistically (finite, nonnegative,
    nonzero under the stamps)."""
    field, centers = _field(seed=13)
    df = DeblendField(
        tiny_net, field, cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean", epistemic_uncertainty_estimation=True,
    )
    _, fields_s = df.deblend_and_predict(centers)
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean", epistemic_uncertainty_estimation=True,
    )
    cat_p, fields_p = sf.deblend_and_predict(centers)
    np.testing.assert_allclose(
        fields_p["predicted_mean_field"],
        fields_s["predicted_mean_field"],
        atol=2e-5,
    )
    np.testing.assert_allclose(
        fields_p["predicted_stddev_field"],
        fields_s["predicted_stddev_field"],
        atol=2e-5,
    )
    np.testing.assert_allclose(
        fields_p["residual_field"], fields_s["residual_field"], atol=2e-5
    )
    # epistemic is sampling-based (independent draws per path) — compare
    # statistically.  NB the canvas CAN dip slightly negative: the order-3
    # spline render overshoots at stamp edges, single-chip path included.
    epi = fields_p["predicted_epistemic_field"]
    epi_s = fields_s["predicted_epistemic_field"]
    assert epi is not None and np.isfinite(epi).all()
    assert epi.max() > 0
    np.testing.assert_allclose(epi.sum(), epi_s.sum(), rtol=0.5)
    norms = np.asarray(cat_p.epistemic_norm, np.float32)
    assert np.isfinite(norms).all() and (norms > 0).all()


def test_sharded_epistemic_normalise_bracket(tiny_net):
    """normalise=True + epistemic: the band-local sample stats must apply
    the normalize bracket ONCE (regression: the stream once passed already-
    normalized stamps into deblend_sample_stats(normalise=True)).  The
    per-source epistemic_norm then agrees statistically with the
    single-chip stream."""
    field, centers = _field(seed=17, n_src=6)
    cfg = PipelineConfig(
        cutout_size=CS, nb_of_bands=B, epistemic_samples=32
    )
    df = DeblendField(
        tiny_net, field, cutout_size=CS, nb_of_bands=B, cfg=cfg,
        z_mode="mean", normalise=True,
        epistemic_uncertainty_estimation=True,
    )
    cat_s, _ = df.deblend_and_render(centers)
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=cfg,
        z_mode="mean", normalise=True,
        epistemic_uncertainty_estimation=True,
    )
    cat_p, _ = sf.deblend_and_render(centers)
    a = np.asarray(cat_s.epistemic_norm, np.float32)
    b = np.asarray(cat_p.epistemic_norm, np.float32)
    assert np.isfinite(b).all() and (b > 0).all()
    # independent Monte-Carlo draws: agree within sampling noise, not bits
    np.testing.assert_allclose(b, a, rtol=0.6)


def test_residency_report_matches_formula(tiny_net):
    """The docstring arithmetic (F/D + 2*halo) * F * B must match the LIVE
    per-device buffer sizes (addressable shards on the virtual mesh) — the
    assertion-backed residency probe of VERDICT r3 weak #6."""
    field, _ = _field()
    sf = ShardedFieldDeblender(tiny_net, field, _mesh(), cutout_size=CS,
                               nb_of_bands=B, cfg=_cfg())
    rep = sf.residency_report()
    assert rep["field_bytes_per_device"] == rep["predicted_field_bytes"]
    assert rep["canvas_bytes_per_device"] == rep["predicted_canvas_bytes"]
    assert rep["predicted_field_bytes"] == sf.h_pad * F * B * 4
    # every mesh device holds exactly one field shard + one canvas shard
    assert len(rep["per_device"]) == D
    for total in rep["per_device"].values():
        assert total == (
            rep["field_bytes_per_device"] + rep["canvas_bytes_per_device"]
        )


def test_sharded_timings_instrumented(tiny_net):
    """Both sharded drivers expose stage timings like the single-chip
    drivers: deblend_and_render (upload/deblend_render/field_download) and
    the iterative loop (plus detect/subtract)."""
    field, centers = _field()
    sf = ShardedFieldDeblender(tiny_net, field, _mesh(), cutout_size=CS,
                               nb_of_bands=B, cfg=_cfg(), z_mode="mean")
    t = {}
    cat, _ = sf.deblend_and_render(centers, timings=t)
    assert cat is not None
    for key in ("upload", "deblend_render", "field_download"):
        assert t[key] >= 0.0
    sf2 = ShardedFieldDeblender(tiny_net, field, _mesh(), cutout_size=CS,
                                nb_of_bands=B, cfg=_cfg(), z_mode="mean")
    t2 = {}
    cat2, _ = sf2.iterative_deblend_and_render(
        centers, max_iterations=1, timings=t2
    )
    assert cat2 is not None
    for key in ("upload", "deblend_render", "subtract", "field_download"):
        assert t2[key] >= 0.0


def test_sharded_quantized_matches_single_device(tiny_net):
    """int8 composes with field sharding (VERDICT r4 #6): the band-local
    chunk forward runs the fake-quant-free int8 path with replicated
    kernels/scales, matching the single-chip DeblendField(quantized=...)
    driver's catalog and residual; a normalise-mismatched bundle is
    rejected like the single-chip driver rejects it."""
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.models.quantized import quantize_vae

    model, variables = tiny_net
    calib, _, _ = simulate_batch(jax.random.PRNGKey(5), 16, stamp=CS, bands=B)
    qv = quantize_vae(model, variables, calib)

    field, centers = _field(seed=7)
    df = DeblendField(
        tiny_net, field, cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean", quantized=qv,
    )
    cat_s, res_s = df.deblend_and_render(centers)
    sf = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean", quantized=qv,
    )
    cat_p, res_p = sf.deblend_and_render(centers)
    np.testing.assert_array_equal(cat_p.list_idx, cat_s.list_idx)
    np.testing.assert_allclose(cat_p.mse_center, cat_s.mse_center, rtol=1e-4)
    np.testing.assert_allclose(res_p, res_s, atol=2e-5)
    # int8 really served: the quantized residual differs from the float one
    sf2 = ShardedFieldDeblender(
        tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B, cfg=_cfg(),
        z_mode="mean",
    )
    _, res_float = sf2.deblend_and_render(centers)
    assert np.abs(res_p - res_float).max() > 1e-4

    with pytest.raises(ValueError, match="normalise"):
        ShardedFieldDeblender(
            tiny_net, field, _mesh(), cutout_size=CS, nb_of_bands=B,
            cfg=_cfg(), z_mode="mean", normalise=True, quantized=qv,
        )
