"""Tiled-field tests: origin math, tiled-vs-untiled detection parity, core
dedup in overlaps, and an end-to-end tiled deblend on a large synthetic
field."""

import jax
import numpy as np

from debvader_tpu.config import DetectionConfig, ModelConfig, PipelineConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.ops.detection import detect_objects
from debvader_tpu.pipeline.tiles import (
    TiledDeblendField,
    detect_objects_tiled,
    tile_origins,
)

DET = DetectionConfig(thresh=25.0, background_box=32)


def _field(f, srcs, noise=0.01, seed=0, bands=1):
    rng = np.random.default_rng(seed)
    img = (noise * rng.normal(size=(f, f))).astype(np.float32)
    yy, xx = np.mgrid[:f, :f]
    for cy, cx, a in srcs:
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.6**2))
    if bands == 1:
        return img
    return np.repeat(img[None, :, :, None], bands, axis=-1)


def test_tile_origins_cover_and_overlap():
    starts = tile_origins(300, 160, 40)
    assert starts[0] == 0 and starts[-1] == 140
    # full coverage
    covered = np.zeros(300, bool)
    for s in starts:
        covered[s : s + 160] = True
    assert covered.all()
    assert tile_origins(100, 160, 40) == [0]


def test_tiled_matches_untiled_detection():
    srcs = [(40.0, 50.0, 3.0), (150.0, 200.0, 2.0), (260.0, 80.0, 4.0),
            (155.0, 150.0, 2.5)]
    img = _field(300, srcs)
    det_full = detect_objects(img, DET)
    det_tiled = detect_objects_tiled(img, DET, tile=160, overlap=40)
    assert len(det_tiled) == len(det_full) == len(srcs)
    a = np.asarray(sorted(map(tuple, det_full)))
    b = np.asarray(sorted(map(tuple, det_tiled)))
    np.testing.assert_allclose(a, b, atol=1.0)


def test_source_in_overlap_counted_once():
    # place a source exactly on a tile seam (stride 120 => seam at 120)
    srcs = [(120.0, 120.0, 3.0)]
    img = _field(300, srcs)
    det = detect_objects_tiled(img, DET, tile=160, overlap=40)
    assert len(det) == 1
    np.testing.assert_allclose(det[0], [120 - 150, 120 - 150], atol=1.0)


def test_tiled_on_small_field_falls_back():
    srcs = [(40.0, 50.0, 3.0)]
    img = _field(128, srcs)
    det = detect_objects_tiled(img, DET, tile=1024, overlap=64)
    assert len(det) == 1


def test_tiled_detection_sharded_matches_unsharded():
    """The tile stack sharded over the 8-device 'data' axis must produce
    exactly the serial result (VERDICT r1 item 8)."""
    from debvader_tpu.parallel import make_mesh

    srcs = [(40.0, 50.0, 3.0), (150.0, 200.0, 2.0), (260.0, 80.0, 4.0),
            (155.0, 150.0, 2.5)]
    img = _field(300, srcs)
    mesh = make_mesh()
    det_serial = detect_objects_tiled(img, DET, tile=160, overlap=40)
    det_sharded = detect_objects_tiled(img, DET, tile=160, overlap=40, mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(sorted(map(tuple, det_serial))),
        np.asarray(sorted(map(tuple, det_sharded))),
    )


def test_tiled_detect_and_deblend_on_mesh():
    """Full tiled detect + deblend + epistemic sampling with every device
    pass sharded over the 8-CPU mesh."""
    from debvader_tpu.parallel import make_mesh

    cfg = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))
    model = DeblenderVAE(cfg)
    variables = init_vae(model, jax.random.PRNGKey(0))
    srcs = [(60.0, 70.0, 3.0), (200.0, 150.0, 2.5), (150.0, 240.0, 3.5)]
    field = _field(300, srcs, bands=3)
    mesh = make_mesh()
    tdf = TiledDeblendField(
        (model, variables),
        field,
        cutout_size=23,
        nb_of_bands=3,
        cfg=PipelineConfig(cutout_size=23, nb_of_bands=3, tile_size=160, tile_overlap=40),
        det_cfg=DetectionConfig(thresh=25.0, background_box=32, detection_band=0),
        mesh=mesh,
        epistemic_uncertainty_estimation=True,
    )
    centers = tdf.detect()
    assert len(centers) == 3
    res = tdf.detect_and_deblend()
    assert len(res) == 3
    assert np.isfinite(np.stack(res.epistemic_uncertainty)).all()
    resid = tdf.get_residual_field()
    assert resid.shape == field.shape and np.isfinite(resid).all()


def test_tiled_deblend_field_end_to_end():
    cfg = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))
    model = DeblenderVAE(cfg)
    variables = init_vae(model, jax.random.PRNGKey(0))
    srcs = [(60.0, 70.0, 3.0), (200.0, 150.0, 2.5), (150.0, 240.0, 3.5)]
    field = _field(300, srcs, bands=3)  # (1, 300, 300, 3)
    tdf = TiledDeblendField(
        (model, variables),
        field,
        cutout_size=23,
        nb_of_bands=3,
        cfg=PipelineConfig(cutout_size=23, nb_of_bands=3, tile_size=160, tile_overlap=40),
        det_cfg=DetectionConfig(thresh=25.0, background_box=32, detection_band=0),
    )
    centers = tdf.detect()
    assert len(centers) == 3
    res = tdf.detect_and_deblend()
    assert len(res) == 3
    resid = tdf.get_residual_field()
    assert resid.shape == field.shape and np.isfinite(resid).all()


def test_detect_deblend_render_on_mesh():
    """The fused survey serving path (tiled detection + streaming
    deblend_and_render) with every device pass sharded over the mesh."""
    from debvader_tpu.parallel import make_mesh

    cfg = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))
    model = DeblenderVAE(cfg)
    variables = init_vae(model, jax.random.PRNGKey(0))
    srcs = [(60.0, 70.0, 3.0), (200.0, 150.0, 2.5), (150.0, 240.0, 3.5)]
    field = _field(300, srcs, bands=3)
    mesh = make_mesh()
    tdf = TiledDeblendField(
        (model, variables),
        field,
        cutout_size=23,
        nb_of_bands=3,
        cfg=PipelineConfig(cutout_size=23, nb_of_bands=3, tile_size=160, tile_overlap=40),
        det_cfg=DetectionConfig(thresh=25.0, background_box=32, detection_band=0),
        mesh=mesh,
    )
    catalog, residual = tdf.detect_deblend_render(measure=True)
    assert len(catalog) == 3
    assert residual.shape == field.shape and np.isfinite(residual).all()
    assert "flux" in catalog.dtype.names
    # unsharded run produces the same catalog scalars and residual
    tdf2 = TiledDeblendField(
        (model, variables),
        field,
        cutout_size=23,
        nb_of_bands=3,
        cfg=PipelineConfig(cutout_size=23, nb_of_bands=3, tile_size=160, tile_overlap=40),
        det_cfg=DetectionConfig(thresh=25.0, background_box=32, detection_band=0),
    )
    cat2, res2 = tdf2.detect_deblend_render(measure=True)
    np.testing.assert_array_equal(catalog.list_idx, cat2.list_idx)
    np.testing.assert_allclose(residual, res2, atol=2e-4)


def test_tiled_detection_sharded_fused_core():
    """The fused Pallas detect core composes with the mesh-sharded tiled
    path: shard_map hands each device its local tile slab (every stage is
    per-tile independent) and the result matches the single-device fused
    run exactly (interpret mode off-TPU)."""
    import dataclasses

    from debvader_tpu.parallel import make_mesh

    srcs = [(40.0, 50.0, 3.0), (150.0, 200.0, 2.0), (260.0, 80.0, 4.0),
            (155.0, 150.0, 2.5)]
    img = _field(300, srcs)
    cfg = dataclasses.replace(DET, use_pallas_fused=True)
    mesh = make_mesh()
    det_serial = detect_objects_tiled(img, cfg, tile=160, overlap=40)
    det_sharded = detect_objects_tiled(img, cfg, tile=160, overlap=40, mesh=mesh)
    assert len(det_sharded) == len(srcs)
    np.testing.assert_array_equal(
        np.asarray(sorted(map(tuple, det_serial))),
        np.asarray(sorted(map(tuple, det_sharded))),
    )


def _tiny_tdf(field, upload_dtype=None, **extra):
    cfg = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4,
                      filters=(4, 8), kernels=(3, 3))
    model = DeblenderVAE(cfg)
    variables = init_vae(model, jax.random.PRNGKey(0))
    return TiledDeblendField(
        (model, variables), field, cutout_size=23, nb_of_bands=3,
        cfg=PipelineConfig(cutout_size=23, nb_of_bands=3, tile_size=160,
                           tile_overlap=40),
        det_cfg=DetectionConfig(thresh=25.0, background_box=32,
                                detection_band=0),
        upload_dtype=upload_dtype, **extra,
    )


def test_detect_on_device_field_matches_host():
    """The serving drivers detect on the memoized device field (no separate
    band upload); results must equal host-array detection exactly."""
    srcs = [(60.0, 70.0, 3.0), (200.0, 150.0, 2.5), (150.0, 240.0, 3.5)]
    field = _field(300, srcs, bands=3)
    tdf = _tiny_tdf(field)
    host = tdf.detect()
    dev = tdf.detect(field=tdf._device_field(tdf.field_image))
    np.testing.assert_array_equal(host, dev)
    # and the fused driver (which routes through the device field) finds them
    cat, resid = tdf.detect_deblend_render()
    assert len(cat) == 3 and np.isfinite(resid).all()


def test_upload_dtype_reduced_precision_field():
    """upload_dtype='bfloat16' halves the field upload; results stay within
    bf16 pixel quantization of the full-precision path."""
    import pytest

    srcs = [(60.0, 70.0, 3.0), (200.0, 150.0, 2.5), (150.0, 240.0, 3.5)]
    field = _field(300, srcs, bands=3)
    full = _tiny_tdf(field)
    half = _tiny_tdf(field, upload_dtype="bfloat16")
    c_full = full.detect(field=full._device_field(full.field_image))
    c_half = half.detect(field=half._device_field(half.field_image))
    # high-SNR synthetic sources: same detections despite pixel quantization
    np.testing.assert_array_equal(np.sort(c_full, 0), np.sort(c_half, 0))
    cat_f, resid_f = full.detect_deblend_render()
    cat_h, resid_h = half.detect_deblend_render()
    assert len(cat_f) == len(cat_h) == 3
    scale = np.abs(field).max()
    assert np.abs(resid_h - resid_f).max() <= 2e-2 * scale

    with pytest.raises(ValueError, match="upload_dtype"):
        _tiny_tdf(field, upload_dtype="int8")


def test_mesh_padding_exceeds_stack_size():
    """A tile stack SMALLER than the mesh's data axis must pad cyclically
    (3 tiles on an 8-way mesh needs 5 pad rows; a plain x[:pad] underfills
    and shard_map rejects the stack) — and the single-tile tile>=F fast
    path must survive a mesh too."""
    from debvader_tpu.ops.detection import detect_sources, detect_sources_batched
    from debvader_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (128, 128)).astype(np.float32)
    img[40:47, 50:57] += 40.0
    mesh = make_mesh()
    tiles = np.stack([img, img, img])
    res = detect_sources_batched(tiles, DET, mesh=mesh)
    assert len(res) == 3
    ref = detect_sources(img, DET)
    for r in res:
        np.testing.assert_array_equal(r["labels"], ref["labels"])

    objs = detect_objects_tiled(img, DET, tile=256, mesh=mesh)
    assert len(objs) == len(ref["y"])


def test_transfer_dtype_validated():
    """transfer_dtype must reject anything but bfloat16/float16 — an int8
    cast would silently zero the residual (review finding)."""
    import pytest

    from debvader_tpu.pipeline.field import DeblendField
    from debvader_tpu.pipeline.iterative import IterativeDeblendField

    cfg = ModelConfig(
        stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3)
    )
    model = DeblenderVAE(cfg)
    variables = init_vae(model, jax.random.PRNGKey(0))
    field = _field(100, [(50.0, 50.0, 3.0)], bands=3)
    df = DeblendField((model, variables), field, cutout_size=23, nb_of_bands=3)
    with pytest.raises(ValueError, match="transfer_dtype"):
        df.deblend_and_render(np.asarray([[0, 0]]), transfer_dtype="int8")
    it = IterativeDeblendField(
        (model, variables), field, cutout_size=23, nb_of_bands=3
    )
    with pytest.raises(ValueError, match="transfer_dtype"):
        it.iterative_deblend_and_render(
            np.asarray([[0, 0]]), transfer_dtype="float8_e4m3fn"
        )


def test_tiled_matches_untiled_detection_lutz():
    """deblend_algo='lutz' composes with the tiled path (the Lutz tree
    runs per tile inside _postprocess_coo, and tile cores partition the
    plane exactly like the watershed default)."""
    import dataclasses

    srcs = [(40.0, 50.0, 3.0), (150.0, 200.0, 2.0), (260.0, 80.0, 4.0),
            (155.0, 150.0, 2.5)]
    img = _field(300, srcs)
    det_l = dataclasses.replace(DET, deblend_algo="lutz")
    det_full = detect_objects(img, det_l)
    det_tiled = detect_objects_tiled(img, det_l, tile=160, overlap=40)
    assert len(det_tiled) == len(det_full) == len(srcs)
    a = np.asarray(sorted(map(tuple, det_full)))
    b = np.asarray(sorted(map(tuple, det_tiled)))
    np.testing.assert_allclose(a, b, atol=1.0)
