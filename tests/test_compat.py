"""The compat namespace: reference-shaped entry points behave like the
reference's module functions."""

import jax
import jax.numpy as jnp
import numpy as np

import debvader_tpu.compat as compat
from debvader_tpu.config import ModelConfig
from debvader_tpu.models.vae import init_vae

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))


def test_all_reference_symbols_present():
    for name in (
        "DeblendField", "IterativeDeblendField", "detect_objects",
        "extract_cutouts", "deblend", "position_optimization",
        "normalize_non_linear", "denormalize_non_linear", "mse", "vae_loss",
        "create_model_vae", "load_deblender", "train_network",
        "train_deblender", "define_callbacks",
    ):
        assert hasattr(compat, name), name


def test_vae_loss_is_negative_log_prob():
    model = compat.create_model_vae(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 23, 23, 3)), jnp.float32)
    dist, _ = model.apply(variables, x, rng=jax.random.PRNGKey(1))
    loss = compat.vae_loss(x, dist)
    assert loss.shape == (2, 23, 23, 3)  # per-pixel, like the reference
    np.testing.assert_allclose(
        np.asarray(loss), -np.asarray(dist.log_prob(x)), rtol=1e-6
    )


def test_mse_matches_reference_formula(rng_np):
    a, b = rng_np.random((4, 5)), rng_np.random((4, 5))
    np.testing.assert_allclose(
        float(compat.mse(jnp.asarray(a), jnp.asarray(b))),
        np.mean(np.square(a - b)),
        rtol=1e-6,
    )


def test_extract_cutouts_reference_signature(rng_np):
    image = rng_np.random((1, 15, 15, 3))
    cutouts, list_idx = compat.extract_cutouts(
        field_image=image, field_size=15,
        galaxy_distances_to_center=[[-4, -3]], cutout_size=5, nb_of_bands=3,
    )
    assert list_idx == [0]
    np.testing.assert_allclose(cutouts[0], image[0, 1:6, 2:7])


def test_deblend_signature(rng_np):
    model = compat.create_model_vae(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    imgs = rng_np.random((3, 23, 23, 3))
    means, dist = compat.deblend((model, variables), imgs)
    assert means.shape == (3, 23, 23, 3)
    assert hasattr(dist, "stddev") and hasattr(dist, "mean")
