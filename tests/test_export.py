"""AOT export tests (the jax.export replacement for the ONNX path)."""

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.config import ModelConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.utils.export import export_deblender, load_exported, roundtrip_check

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))


def test_export_roundtrip_parity():
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 23, 23, 3)), jnp.float32)
    assert roundtrip_check(model, variables, x)


def test_export_to_file_and_reload(tmp_path):
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    p = tmp_path / "deblender.stablehlo"
    export_deblender(model, variables, batch_size=2, path=p)
    assert p.stat().st_size > 1000
    call = load_exported(p)
    x = jnp.zeros((2, 23, 23, 3), jnp.float32)
    mean, std = call(x, jax.random.key_data(jax.random.PRNGKey(0)))
    assert mean.shape == (2, 23, 23, 3)
    assert float(jnp.min(std)) >= 1e-4 - 1e-9


def test_exported_sampling_is_keyed():
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    blob = export_deblender(model, variables, batch_size=2)
    call = load_exported(blob)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 23, 23, 3)), jnp.float32)
    m1, _ = call(x, jax.random.key_data(jax.random.PRNGKey(1)))
    m2, _ = call(x, jax.random.key_data(jax.random.PRNGKey(2)))
    m1b, _ = call(x, jax.random.key_data(jax.random.PRNGKey(1)))
    assert not np.allclose(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m1b))


def test_compilation_cache_helper(tmp_path):
    """enable_compilation_cache creates the directory and points JAX's
    persistent cache at it (bench scripts rely on this for cold starts)."""
    import jax

    from debvader_tpu.utils.compile_cache import enable_compilation_cache

    target = tmp_path / "xla-cache"
    out = enable_compilation_cache(str(target))
    assert out == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)
