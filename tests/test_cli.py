"""CLI entry points (python -m debvader_tpu): train -> deblend -> detect ->
serve round-trip on tiny arrays, exercising the argparse surface in-process."""

import numpy as np
import pytest

from debvader_tpu.cli import main

TINY = ["--stamp-size", "23", "--bands", "3", "--latent", "4",
        "--filters", "4", "8"]


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 23, 23, 3)).astype(np.float32)
    np.save(root / "x.npy", x)
    np.save(root / "y.npy", x)
    out = root / "weights"
    rc = main(
        ["train", *TINY, "--blended", str(root / "x.npy"),
         "--isolated", str(root / "y.npy"), "--out", str(out),
         "--epochs", "1", "--batch-size", "4",
         "--metrics-log", str(root / "metrics.jsonl")]
    )
    assert rc == 0
    assert (root / "metrics.jsonl").exists()
    return root, out


def test_cli_deblend(weights_dir):
    root, weights = weights_dir
    rng = np.random.default_rng(1)
    stamps = rng.normal(size=(4, 23, 23, 3)).astype(np.float32)
    np.save(root / "stamps.npy", stamps)
    rc = main(
        ["deblend", *TINY, "--weights", str(weights),
         "--stamps", str(root / "stamps.npy"),
         "--out", str(root / "means.npy"), "--std", str(root / "std.npy")]
    )
    assert rc == 0
    means = np.load(root / "means.npy")
    assert means.shape == stamps.shape and np.isfinite(means).all()
    assert np.load(root / "std.npy").shape == stamps.shape


def _field(root):
    rng = np.random.default_rng(2)
    f = 128
    img = (0.01 * rng.normal(size=(f, f))).astype(np.float32)
    yy, xx = np.mgrid[:f, :f]
    for cy, cx in ((40, 50), (90, 80)):
        img += 3 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.6**2))
    field = np.repeat(img[None, :, :, None], 3, axis=-1).astype(np.float32)
    path = root / "field.npy"
    np.save(path, field)
    return path


def test_cli_detect_and_serve(weights_dir):
    root, weights = weights_dir
    field = _field(root)
    rc = main(
        ["detect", "--field", str(field), "--out", str(root / "centers.npy"),
         "--tile", "64", "--overlap", "16", "--thresh", "25.0",
         "--detection-band", "0"]
    )
    assert rc == 0
    centers = np.load(root / "centers.npy")
    assert len(centers) == 2

    rc = main(
        ["serve", *TINY, "--weights", str(weights), "--field", str(field),
         "--centers", str(root / "centers.npy"),
         "--out-prefix", str(root / "out"), "--optimise-positions",
         "--measure"]
    )
    assert rc == 0
    residual = np.load(str(root / "out_residual.npy"))
    assert residual.shape == (1, 128, 128, 3)
    import pandas as pd

    cat = pd.read_csv(str(root / "out_catalog.csv"))
    assert len(cat) == 2
    for col in ("mse_center", "shifts_0", "flux_0", "passed_cuts"):
        assert col in cat.columns


def test_cli_export(weights_dir):
    root, weights = weights_dir
    rc = main(
        ["export", *TINY, "--weights", str(weights),
         "--out", str(root / "fwd.stablehlo"), "--batch", "2"]
    )
    assert rc == 0
    assert (root / "fwd.stablehlo").stat().st_size > 0


def test_cli_version_and_help():
    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0


def test_cli_deblend_f32_stages(weights_dir):
    """--f32-stages threads into ModelConfig.decoder_f32_stages (mixed-
    precision serving) through both the weights-dir and survey loaders."""
    root, weights = weights_dir
    rng = np.random.default_rng(3)
    stamps = rng.normal(size=(4, 23, 23, 3)).astype(np.float32)
    np.save(root / "stamps_mp.npy", stamps)
    rc = main(
        ["deblend", *TINY, "--weights", str(weights),
         "--stamps", str(root / "stamps_mp.npy"),
         "--out", str(root / "means_mp.npy"),
         "--dtype", "bfloat16", "--f32-stages", "1"]
    )
    assert rc == 0
    means = np.load(root / "means_mp.npy")
    assert means.shape == (4, 23, 23, 3) and np.isfinite(means).all()


def test_cli_quantize_and_serve(weights_dir):
    """r4: quantize bundles persist and serve — calibrate (+2 QAT steps for
    the mechanism), save, reload through `serve --quantized`."""
    root, weights = weights_dir
    field = _field(root)
    bundle = root / "int8_bundle"
    rc = main(
        ["quantize", *TINY, "--weights", str(weights), "--out", str(bundle),
         "--calib-n", "8", "--qat-steps", "2", "--qat-batch", "4"]
    )
    assert rc == 0
    rc = main(
        ["serve", *TINY, "--weights", str(weights), "--field", str(field),
         "--centers", str(root / "centers.npy"),
         "--out-prefix", str(root / "q8"), "--quantized", str(bundle)]
    )
    assert rc == 0
    residual = np.load(str(root / "q8_residual.npy"))
    assert np.isfinite(residual).all()


def test_quantized_bundle_roundtrip(weights_dir, tmp_path):
    """save_quantized/load_quantized reproduce the int8 forward exactly."""
    import jax
    import jax.numpy as jnp

    from debvader_tpu.models.quantized import (
        load_quantized,
        quantize_vae,
        quantized_forward,
        save_quantized,
    )
    from debvader_tpu.training.checkpoint import load_weights_from
    from debvader_tpu.config import ModelConfig
    from debvader_tpu.models.vae import DeblenderVAE

    root, weights = weights_dir
    cfg = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4,
                      filters=(4, 8), kernels=(3, 3))
    model = DeblenderVAE(cfg)
    variables = load_weights_from(weights)
    rng = np.random.default_rng(5)
    calib = rng.normal(size=(8, 23, 23, 3)).astype(np.float32)
    qv = quantize_vae(model, variables, calib)
    save_quantized(qv, tmp_path / "bundle")
    qv2 = load_quantized(tmp_path / "bundle")
    assert qv2.cfg == cfg and qv2.normalise == qv.normalise
    x = rng.normal(size=(3, 23, 23, 3)).astype(np.float32)
    a, _ = quantized_forward(qv, x, jax.random.PRNGKey(0), z_mode="mean")
    b, _ = quantized_forward(qv2, x, jax.random.PRNGKey(0), z_mode="mean")
    np.testing.assert_array_equal(np.asarray(a.loc), np.asarray(b.loc))


def test_cli_enables_compilation_cache(weights_dir, tmp_path, monkeypatch):
    """Production CLI entries enable the persistent compilation cache (the
    measured cold-start lever, BASELINE.md r4: 20.4 -> 11.5 s) and populate
    the cache directory; DEBVADER_NO_COMPILE_CACHE=1 opts out."""
    import jax

    root, weights = weights_dir
    rng = np.random.default_rng(9)
    np.save(root / "cc_stamps.npy",
            rng.normal(size=(2, 23, 23, 3)).astype(np.float32))
    cache = tmp_path / "xla-cache"
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(cache))
    # CPU-test compiles finish under the production 1 s persistence
    # threshold; drop it so population is observable here
    monkeypatch.setenv("DEBVADER_CACHE_MIN_COMPILE_SECS", "0")
    monkeypatch.delenv("DEBVADER_NO_COMPILE_CACHE", raising=False)
    # the fixture's train run already initialized the process-wide cache
    # singleton at its default dir; reset so the re-pointed dir takes
    from jax._src import compilation_cache

    compilation_cache.reset_cache()
    rc = main(
        ["deblend", *TINY, "--weights", str(weights),
         "--stamps", str(root / "cc_stamps.npy"),
         "--out", str(root / "cc_means.npy")]
    )
    assert rc == 0
    assert jax.config.jax_compilation_cache_dir == str(cache)
    assert any(cache.iterdir()), "CLI run did not populate the cache dir"

    # opt-out leaves the config wherever the caller had it
    monkeypatch.setenv("DEBVADER_NO_COMPILE_CACHE", "1")
    jax.config.update("jax_compilation_cache_dir", None)
    rc = main(
        ["deblend", *TINY, "--weights", str(weights),
         "--stamps", str(root / "cc_stamps.npy"),
         "--out", str(root / "cc_means.npy")]
    )
    assert rc == 0
    assert jax.config.jax_compilation_cache_dir is None


def test_cli_detect_lutz(weights_dir):
    """--deblend-algo lutz threads into DetectionConfig through the CLI."""
    root, _ = weights_dir
    path = _field(root)
    rc = main(
        ["detect", "--field", str(path),
         "--out", str(root / "centers_lutz.npy"),
         "--tile", "64", "--overlap", "16", "--thresh", "25.0",
         "--detection-band", "0", "--deblend-algo", "lutz"]
    )
    assert rc == 0
    centers = np.load(root / "centers_lutz.npy")
    assert len(centers) >= 2  # both injected sources found
