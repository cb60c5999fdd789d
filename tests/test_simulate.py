"""Simulator tests: shapes, physical sanity, determinism, and two-stage
training on simulated stamps (BASELINE config 3's data source)."""

import jax
import numpy as np

from debvader_tpu.config import ModelConfig, TrainConfig
from debvader_tpu.data.simulate import make_dataset, simulate_batch
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.training.train import create_train_state, make_train_step, train_deblender

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))


def test_simulate_shapes_and_sanity():
    blend, iso_noisy, iso_clean = simulate_batch(
        jax.random.PRNGKey(0), 8, stamp=23, bands=3
    )
    for arr in (blend, iso_noisy, iso_clean):
        assert arr.shape == (8, 23, 23, 3)
        assert np.isfinite(np.asarray(arr)).all()
    # blend contains at least the central galaxy's flux
    assert (np.asarray(blend).sum((1, 2, 3)) >= 0.8 * np.asarray(iso_clean).sum((1, 2, 3))).all()
    # central galaxy is centered: peak of clean stamp near center
    clean = np.asarray(iso_clean)
    for i in range(8):
        p = np.unravel_index(clean[i, :, :, 1].argmax(), (23, 23))
        assert abs(p[0] - 11) <= 2 and abs(p[1] - 11) <= 2


def test_simulate_deterministic():
    a = simulate_batch(jax.random.PRNGKey(3), 4, stamp=23, bands=3)
    b = simulate_batch(jax.random.PRNGKey(3), 4, stamp=23, bands=3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_on_simulated_two_stage(tmp_path):
    """BASELINE config 3 smoke: beta-annealed ELBO on simulated stamps,
    two-stage."""
    data = make_dataset(jax.random.PRNGKey(1), n_train=32, n_val=16, stamp=23, bands=3)
    hist_vae, hist_debl, state, model = train_deblender(
        "sim", None, 2,
        training_data_vae=data["vae"][0], validation_data_vae=data["vae"][1],
        training_data_deblender=data["deblender"][0],
        validation_data_deblender=data["deblender"][1],
        nb_of_bands=3, batch_size=8, verbose=0, model_cfg=TINY,
        train_cfg=TrainConfig(batch_size=8, kl_anneal_steps=8, learning_rate=1e-3),
        weights_dir=tmp_path,
    )
    assert hist_vae["loss"][-1] < hist_vae["loss"][0] * 1.5  # training is sane
    assert np.isfinite(hist_debl["val_loss"][-1])
