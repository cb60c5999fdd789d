"""Training tests: loss decreases, decoder freezing, bitwise reproducibility,
beta-anneal, best-val checkpointing, two-stage train_deblender smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.config import ModelConfig, TrainConfig
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.training import checkpoint as ckpt
from debvader_tpu.training.train import (
    create_train_state,
    decoder_freeze_labels,
    make_train_step,
    train_deblender,
    train_network,
)

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))


def _toy_data(n=24, cfg=TINY, seed=0):
    rng = np.random.default_rng(seed)
    # Gaussian blob stamps + noise, target = noiseless blob
    s = cfg.stamp_size
    yy, xx = np.mgrid[:s, :s] - s // 2
    blob = np.exp(-(yy**2 + xx**2) / 12.0)
    amp = rng.uniform(0.5, 2.0, size=(n, 1, 1, 1))
    y = amp * blob[None, :, :, None] * np.ones((1, 1, 1, cfg.nb_of_bands))
    x = y + 0.05 * rng.normal(size=y.shape)
    return x.astype(np.float32), y.astype(np.float32)


def test_loss_decreases():
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=1e-3, batch_size=8, seed=0)
    state = create_train_state(model, cfg)
    step = make_train_step(model, cfg)
    x, y = _toy_data(32)
    first = last = None
    for i in range(30):
        state, terms = step(state, jnp.asarray(x[:8]), jnp.asarray(y[:8]))
        if i == 0:
            first = float(terms["loss"])
        last = float(terms["loss"])
    assert last < first


def test_bf16_training_tracks_fp32():
    """bf16 compute with fp32 params/Adam (the mixed-precision layout):
    same init, same data; training must converge equivalently.  The raw NLL
    is hypersensitive near convergence (the 1e-4 scale floor amplifies loc
    rounding ~1e8x), so parity is asserted on the scale-free mse metric and
    on orders-of-magnitude loss reduction, not on the raw NLL value.
    Measured trajectories: fp32 loss 1.39e6 -> 51, mse 0.0616; bf16 loss
    1.39e6 -> 1.5e3, mse 0.0601 after 60 steps."""
    x, y = _toy_data(32)
    finals = {}
    for dt in ("float32", "bfloat16"):
        model = DeblenderVAE(
            ModelConfig(
                stamp_size=23, nb_of_bands=3, latent_dim=4,
                filters=(4, 8), kernels=(3, 3), dtype=dt,
            )
        )
        cfg = TrainConfig(learning_rate=1e-3, batch_size=8, seed=0)
        state = create_train_state(model, cfg)
        # params are fp32 regardless of compute dtype
        assert all(
            p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(state.params)
        )
        step = make_train_step(model, cfg)
        first = last = None
        for i in range(60):
            state, terms = step(state, jnp.asarray(x[:8]), jnp.asarray(y[:8]))
            if i == 0:
                first = float(terms["loss"])
        last = float(terms["loss"])
        mse = float(terms["mse"])
        assert last < first / 100.0, (dt, first, last)
        finals[dt] = mse
    rel = abs(finals["bfloat16"] - finals["float32"]) / abs(finals["float32"])
    assert rel < 0.05, finals


def test_bitwise_reproducible():
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(batch_size=8, seed=7)
    x, y = _toy_data(16)

    def run():
        state = create_train_state(model, cfg)
        step = make_train_step(model, cfg)
        for _ in range(5):
            state, _ = step(state, jnp.asarray(x[:8]), jnp.asarray(y[:8]))
        return state.params

    p1, p2 = run(), run()
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decoder_frozen_in_stage2():
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=1e-3, batch_size=8)
    state = create_train_state(model, cfg, freeze_decoder=True)
    labels = decoder_freeze_labels(state.params)
    assert set(jax.tree_util.tree_leaves(labels)) == {"frozen", "trainable"}
    dec_before = jax.tree_util.tree_map(np.asarray, state.params["decoder"])
    enc_before = jax.tree_util.tree_map(np.asarray, state.params["encoder"])
    step = make_train_step(model, cfg)
    x, y = _toy_data(8)
    for _ in range(3):
        state, _ = step(state, jnp.asarray(x), jnp.asarray(y))
    for a, b in zip(
        jax.tree_util.tree_leaves(dec_before),
        jax.tree_util.tree_leaves(state.params["decoder"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # encoder moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(enc_before),
            jax.tree_util.tree_leaves(state.params["encoder"]),
        )
    )
    assert moved


def test_kl_anneal_schedule():
    from debvader_tpu.training.train import _kl_weight_at

    cfg = TrainConfig(kl_weight=0.01, kl_anneal_steps=100)
    assert float(_kl_weight_at(jnp.asarray(0), cfg)) == 0.0
    np.testing.assert_allclose(float(_kl_weight_at(jnp.asarray(50), cfg)), 0.005)
    np.testing.assert_allclose(float(_kl_weight_at(jnp.asarray(1000), cfg)), 0.01)
    cfg0 = TrainConfig(kl_weight=0.01)
    np.testing.assert_allclose(float(_kl_weight_at(jnp.asarray(0), cfg0)), 0.01)


def test_mc_kl_mode_runs():
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(batch_size=4, kl_mode="mc")
    state = create_train_state(model, cfg)
    step = make_train_step(model, cfg)
    x, y = _toy_data(4)
    state, terms = step(state, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(terms["kl"]))


def test_checkpoint_roundtrip(tmp_path):
    model = DeblenderVAE(TINY)
    state = create_train_state(model, TrainConfig())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ckpt.save_weights(tmp_path / "ckpt", variables)
    restored = ckpt.load_weights_from(tmp_path / "ckpt")
    for a, b in zip(
        jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_val_checkpoint_saves_on_improvement(tmp_path):
    model = DeblenderVAE(TINY)
    state = create_train_state(model, TrainConfig())
    cb = ckpt.BestValCheckpoint(tmp_path / "best", monitor="val_mse", verbose=0)
    cb.on_epoch_end(0, {"val_mse": 1.0}, state)
    assert (tmp_path / "best" / "ckpt").exists()
    mtime = (tmp_path / "best" / "ckpt").stat().st_mtime
    cb.on_epoch_end(1, {"val_mse": 2.0}, state)  # worse: no save
    assert cb.best == 1.0


def test_train_network_history():
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(batch_size=8, seed=1)
    state = create_train_state(model, cfg)
    x, y = _toy_data(16)
    state, hist = train_network(
        model, state, 2, (x, y), (x[:8], y[:8]), 8, verbose=0, train_cfg=cfg
    )
    assert len(hist["loss"]) == 2
    assert "val_mse" in hist and "val_loss" in hist and "kl" in hist


def test_train_deblender_two_stage(tmp_path):
    x, y = _toy_data(16, seed=3)
    hist_vae, hist_debl, state, model = train_deblender(
        survey_name="toy",
        from_survey=None,
        epochs=1,
        training_data_vae=(x, y),
        validation_data_vae=(x[:8], y[:8]),
        training_data_deblender=(x, y),
        validation_data_deblender=(x[:8], y[:8]),
        nb_of_bands=3,
        batch_size=8,
        with_callbacks=True,
        verbose=0,
        model_cfg=TINY,
        weights_dir=tmp_path,
    )
    assert len(hist_vae["loss"]) == 1 and len(hist_debl["loss"]) == 1
    # callbacks wrote both stages' best checkpoints
    assert (tmp_path / "toy" / "vae" / "val_mse" / "ckpt").exists()
    assert (tmp_path / "toy" / "deblender" / "val_loss" / "ckpt").exists()
    # transfer path: warm-start from the saved survey
    hist_vae2, _, _, _ = train_deblender(
        "toy2", "toy", 1, (x, y), (x[:8], y[:8]), (x, y), (x[:8], y[:8]),
        nb_of_bands=3, batch_size=8, verbose=0, model_cfg=TINY, weights_dir=tmp_path,
    )
    assert len(hist_vae2["loss"]) == 1


def test_channel_count_validation():
    x, y = _toy_data(8)
    with pytest.raises(ValueError):
        train_deblender(
            "toy", None, 1, (x, y), (x, y), (x, y), (x, y),
            nb_of_bands=6, batch_size=4, verbose=0, model_cfg=TINY,
        )
