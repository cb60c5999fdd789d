"""Tests for encoder freezing (band-transfer config), full train-state
resume, the profiling utilities, and the metrics log."""

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.config import ModelConfig, TrainConfig
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.training import checkpoint as ckpt
from debvader_tpu.training.train import create_train_state, make_train_step
from debvader_tpu.utils.profiling import MetricsLog, stage_timer

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))


def _toy(n=8, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.normal(size=(n, 23, 23, 3)).astype(np.float32)
    return y + 0.1 * rng.normal(size=y.shape).astype(np.float32), y


def test_freeze_encoder_for_latent_reuse():
    # BASELINE.json config 5: frozen-encoder transfer
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=1e-3)
    state = create_train_state(model, cfg, freeze="encoder")
    enc_before = jax.tree_util.tree_map(np.asarray, state.params["encoder"])
    dec_before = jax.tree_util.tree_map(np.asarray, state.params["decoder"])
    step = make_train_step(model, cfg)
    x, y = _toy()
    for _ in range(3):
        state, _ = step(state, jnp.asarray(x), jnp.asarray(y))
    for a, b in zip(
        jax.tree_util.tree_leaves(enc_before),
        jax.tree_util.tree_leaves(state.params["encoder"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(dec_before),
            jax.tree_util.tree_leaves(state.params["decoder"]),
        )
    )


def test_train_state_resume_bit_exact(tmp_path):
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=1e-3, seed=5)
    x, y = _toy()
    step = make_train_step(model, cfg)

    # run 4 steps straight through
    s_full = create_train_state(model, cfg)
    for _ in range(4):
        s_full, _ = step(s_full, jnp.asarray(x), jnp.asarray(y))

    # run 2 steps, checkpoint, restore into a fresh state, run 2 more
    s_a = create_train_state(model, cfg)
    for _ in range(2):
        s_a, _ = step(s_a, jnp.asarray(x), jnp.asarray(y))
    ckpt.save_train_state(tmp_path / "state", s_a)

    s_b = create_train_state(model, cfg)  # fresh (different rng path)
    s_b = ckpt.restore_train_state(tmp_path / "state", s_b)
    assert int(s_b.step) == 2
    for _ in range(2):
        s_b, _ = step(s_b, jnp.asarray(x), jnp.asarray(y))

    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.params), jax.tree_util.tree_leaves(s_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage_timer_accumulates():
    times = {}
    with stage_timer(times, "a"):
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    with stage_timer(times, "a", sync=x):
        pass
    assert times["a"] > 0


def test_metrics_log(tmp_path):
    log = MetricsLog(tmp_path / "m.jsonl")
    log.log(0, loss=1.5, mse=0.2)
    log.log(1, loss=1.2, mse=0.1)
    assert log.series("loss") == [1.5, 1.2]
    assert log.last()["step"] == 1
    lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2


def test_profiler_trace_writes(tmp_path):
    from debvader_tpu.utils.profiling import trace

    with trace(tmp_path):
        x = jnp.ones((32, 32)) @ jnp.ones((32, 32))
        x.block_until_ready()
    # xplane protobuf dump exists
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files)


def test_chunked_train_step_matches_step_loop():
    """make_chunked_train_step's scanned steps run the same math as the
    same steps dispatched one at a time through make_train_step with the
    same simulated batches (same loss_fn, rng threading, optimizer).  The
    two are different XLA programs, so agreement is float-epsilon, not
    bitwise (fusion context shifts reduction orders)."""
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.training.train import make_chunked_train_step

    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=1e-3)
    chunk, batch = 4, 8

    def make_batch(key):
        blend, _, iso_clean = simulate_batch(key, batch, stamp=23, bands=3)
        return blend, iso_clean

    state_a = create_train_state(model, cfg, rng=jax.random.PRNGKey(5))
    run = make_chunked_train_step(
        model, cfg, make_batch=make_batch, chunk=chunk, donate=False
    )
    base = jax.random.PRNGKey(99)
    state_a, terms = run(state_a, base)
    assert np.asarray(terms["loss"]).shape == (chunk,)

    state_b = create_train_state(model, cfg, rng=jax.random.PRNGKey(5))
    step = make_train_step(model, cfg, donate=False)
    for i in range(chunk):
        x, y = make_batch(jax.random.fold_in(base, i))
        state_b, t = step(state_b, x, y)
        np.testing.assert_allclose(
            np.asarray(terms["loss"])[i], np.asarray(t["loss"]), rtol=1e-5
        )

    for pa, pb in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        # The per-step loss agreement above (rtol 1e-5 across the whole
        # chunk) is the functional pin: loss at step i is computed through
        # params after i-1 updates, so matching losses mean matching
        # trajectories.  Per-element params are NOT tightly comparable
        # across the two programs — Adam's scale-free m/sqrt(v) turns
        # float-epsilon gradient differences on near-zero-gradient elements
        # into up-to +-lr drift per step (measured up to 5e-4 after 4 steps
        # at lr=1e-3) — so the param check is a coarse chunk*lr bound that
        # still catches a wrong batch, rng thread, or optimizer wiring.
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=0.05, atol=2e-3
        )
    for sa, sb in zip(
        jax.tree_util.tree_leaves(state_a.batch_stats),
        jax.tree_util.tree_leaves(state_b.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(sa), np.asarray(sb), rtol=0.05, atol=2e-3
        )
    assert int(state_a.step) == int(state_b.step) == chunk


class _ListLoader:
    """Minimal next_batch()/__len__ loader over a fixed batch list."""

    def __init__(self, batches):
        self._batches = batches
        self._i = 0

    def __len__(self):
        return len(self._batches)

    def next_batch(self):
        bx, by = self._batches[self._i % len(self._batches)]
        self._i += 1
        return bx, by


def _run_train_network(
    spd, device_dataset=None, loader=False, n=26, bs=4, lr=0.0, epochs=2
):
    from debvader_tpu.training.train import train_network

    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=lr, seed=3)
    x, y = _toy(n, seed=7)
    xv, yv = _toy(8, seed=9)
    state = create_train_state(model, cfg)
    if loader:
        blocks = [
            (x[i : i + bs], y[i : i + bs]) for i in range(0, n, bs)
        ]
        data = _ListLoader(blocks)
    else:
        data = (x, y)
    state, hist = train_network(
        model, state, epochs, data, (xv, yv), bs, verbose=0, train_cfg=cfg,
        steps_per_dispatch=spd, device_dataset=device_dataset,
    )
    return state, hist


def _assert_metrics_parity(ref, got, rtol=1e-5):
    """History equality.  Run at lr=0, every step's metrics depend only on
    (batch, rng_k), so any ordering / shuffle / rng-threading / sample-
    weighting difference between the dispatch modes shows up exactly; only
    XLA-program float reassociation remains (~1e-7)."""
    _, h_ref = ref
    _, h_got = got
    assert set(h_ref) == set(h_got)
    for k in h_ref:
        np.testing.assert_allclose(h_ref[k], h_got[k], rtol=rtol)


def test_steps_per_dispatch_superbatch_matches_per_step():
    """train_network(steps_per_dispatch=K) must reproduce the per-step path
    — same shuffle order, rng threading, sample-weighted epoch metrics
    (incl. the trailing partial batch) (VERDICT r3 #3).  26 samples at
    batch 4 exercises: full groups of 3, a remainder group of 2 (separate
    scan length), and the 2-row partial tail per-step."""
    ref = _run_train_network(1)
    _assert_metrics_parity(ref, _run_train_network(3, device_dataset=False))


def test_steps_per_dispatch_gather_matches_per_step():
    """Device-resident dataset (gather mode): upload once, scan over batch
    indices — per-dispatch host traffic is the index array only."""
    ref = _run_train_network(1)
    _assert_metrics_parity(ref, _run_train_network(3, device_dataset=True))


def test_steps_per_dispatch_loader_matches_per_step():
    """Loader data: K host batches buffered into one superbatch dispatch."""
    ref = _run_train_network(1, loader=True)
    _assert_metrics_parity(ref, _run_train_network(3, loader=True))


def test_steps_per_dispatch_training_dynamics_track():
    """With updates on, the scanned path tracks the per-step trajectory to
    float-epsilon per step (the two compile as different XLA programs, so
    exact-equality is not expected, and Adam on the steep random-init
    landscape amplifies the ~1e-6 per-step reassociation drift rapidly —
    ~1e-3 after 7 steps).  One 3-step dispatch (12 samples, no tail) keeps
    the comparison mostly pre-chaotic: measured drift 1e-5..2.5e-4
    depending on the data draw, an order below any mechanism error (a
    wrong rng or batch order shifts params at O(1e-2)).  Bitwise equality
    of gather vs superbatch modes is separately exact (same program modulo
    the take())."""
    ref_s, _ = _run_train_network(1, lr=1e-3, epochs=1, n=12)
    got_s, _ = _run_train_network(
        3, device_dataset=True, lr=1e-3, epochs=1, n=12
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_s.params),
        jax.tree_util.tree_leaves(got_s.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_steps_per_dispatch_mesh_matches_per_step():
    """Mesh + steps_per_dispatch: the scanned body shards each step's batch
    over 'data' like make_sharded_train_step (divisible batch only)."""
    from debvader_tpu.parallel import make_mesh
    from debvader_tpu.training.train import train_network

    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=0.0, seed=3)
    x, y = _toy(32, seed=7)
    xv, yv = _toy(16, seed=9)

    def run(**kw):
        state = create_train_state(model, cfg)
        return train_network(
            model, state, 2, (x, y), (xv, yv), 8, verbose=0, train_cfg=cfg,
            **kw,
        )

    _assert_metrics_parity(
        run(), run(mesh=make_mesh(), steps_per_dispatch=2), rtol=1e-4
    )


def test_train_deblender_steps_per_dispatch():
    """The reference-shaped two-stage entry point threads
    steps_per_dispatch through both stages (lr=0 metric parity vs the
    per-step path, like the train_network tests)."""
    from debvader_tpu.training.train import train_deblender

    x, y = _toy(12, seed=21)
    xv, yv = _toy(4, seed=22)
    cfg = TrainConfig(learning_rate=0.0, seed=3, batch_size=4)

    def run(spd):
        return train_deblender(
            "testsurvey", None, 1, (x, y), (xv, yv), (x, y), (xv, yv),
            nb_of_bands=3, batch_size=4, verbose=0, train_cfg=cfg,
            model_cfg=TINY, steps_per_dispatch=spd,
        )

    h1_vae, h1_d, _, _ = run(1)
    h2_vae, h2_d, _, _ = run(3)
    for a, b in ((h1_vae, h2_vae), (h1_d, h2_d)):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5)


def _run_scan_epochs(n=24, bs=4, lr=0.0, epochs=2, callbacks=None):
    from debvader_tpu.training.train import train_network

    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=lr, seed=3)
    x, y = _toy(n, seed=7)
    xv, yv = _toy(8, seed=9)
    state = create_train_state(model, cfg)
    return train_network(
        model, state, epochs, (x, y), (xv, yv), bs, verbose=0,
        train_cfg=cfg, scan_epochs=True, callbacks=callbacks,
    )


def test_scan_epochs_matches_per_step():
    """scan_epochs=True (the whole fit in ONE dispatch, VERDICT r4 #8)
    reproduces the per-step path's epoch logs — shuffle order, rng
    threading, validation rng, metric weighting — at lr=0 exactly (up to
    XLA-program reassociation)."""
    ref = _run_train_network(1, n=24)
    _assert_metrics_parity(ref, _run_scan_epochs(n=24))


def test_scan_epochs_dynamics_track():
    """With updates on, the scanned-epochs trajectory tracks per-step to
    the same float-drift envelope as the other scan modes."""
    ref = _run_train_network(1, n=12, bs=4, lr=1e-4, epochs=1)
    got = _run_scan_epochs(n=12, bs=4, lr=1e-4, epochs=1)
    _assert_metrics_parity(ref, got, rtol=5e-3)


def test_scan_epochs_best_val_checkpoint(tmp_path):
    """Device-tracked best-val states: with a monotonically-improving run
    the saved checkpoint equals the final state; a callback whose best is
    already unbeatable saves nothing."""
    from debvader_tpu.training.train import train_network

    cb = ckpt.BestValCheckpoint(tmp_path / "m", monitor="val_loss", verbose=0)
    state, hist = _run_scan_epochs(lr=1e-3, epochs=3, callbacks=[cb])
    assert cb.best == min(hist["val_loss"])
    if hist["val_loss"][-1] == min(hist["val_loss"]):
        saved = ckpt.load_weights_from(tmp_path / "m" / "ckpt")
        for a, b in zip(
            jax.tree_util.tree_leaves(saved["params"]),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cb2 = ckpt.BestValCheckpoint(tmp_path / "n", monitor="val_loss", verbose=0)
    cb2.best = -np.inf  # unbeatable
    _run_scan_epochs(lr=1e-3, epochs=1, callbacks=[cb2])
    assert not (tmp_path / "n").exists()


def test_scan_epochs_rejects_unsupported():
    import pytest

    from debvader_tpu.training.train import train_network

    model = DeblenderVAE(TINY)
    cfg = TrainConfig(seed=3)
    x, y = _toy(10, seed=7)  # 10 % 4 != 0
    state = create_train_state(model, cfg)
    with pytest.raises(ValueError, match="batch_size"):
        train_network(
            model, state, 1, (x, y), _toy(8, seed=9), 4, verbose=0,
            train_cfg=cfg, scan_epochs=True,
        )


def test_train_deblender_scan_epochs_two_stage(tmp_path):
    """scan_epochs threads through both stages of the two-stage transfer
    trainer: histories carry both stages' epochs and the returned state
    serves finite outputs."""
    from debvader_tpu.training.train import train_deblender

    rng = np.random.default_rng(4)
    y = rng.normal(size=(12, 23, 23, 3)).astype(np.float32)
    x = (y + 0.1 * rng.normal(size=y.shape)).astype(np.float32)
    h_vae, h_deb, state, model = train_deblender(
        "scan_demo", None, 2, (y, y), (y[:4], y[:4]), (x, y), (x[:4], y[:4]),
        nb_of_bands=3, batch_size=4, verbose=0,
        model_cfg=ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4,
                              filters=(4, 8), kernels=(3, 3)),
        train_cfg=TrainConfig(batch_size=4, learning_rate=1e-4, seed=1),
        weights_dir=str(tmp_path),
        scan_epochs=True,
    )
    assert len(h_vae["loss"]) == 2 and len(h_deb["loss"]) == 2
    assert all(np.isfinite(v) for v in h_vae["val_loss"] + h_deb["val_loss"])
    import jax.numpy as jnp

    dist, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x[:2]), z_mode="mean",
    )
    assert np.isfinite(np.asarray(dist.loc)).all()
