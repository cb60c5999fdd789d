"""Training: jitted ELBO steps, two-stage transfer training, histories.

Reference workflow (training/train.py:78-205):

  stage 1 "vae":        train everything on (noisy -> isolated) pairs
  stage 2 "deblender":  freeze the decoder, recompile, train on
                        (blended -> isolated) pairs

Here each stage is a fresh ``TrainState`` (the reference's recompile also
resets Adam moments), the whole optimizer step is one jitted XLA program, and
decoder freezing is an ``optax.multi_transform`` mask rather than a Keras
``trainable`` flag.  The PRNG is threaded explicitly through the state so
training is bitwise reproducible for a given seed (the BASELINE.json
"bitwise-stable ELBO training" requirement) — no host randomness touches the
step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from debvader_tpu.config import ModelConfig, TrainConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.training import losses

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_chunked_train_step",
    "make_eval_step",
    "train_network",
    "train_deblender",
    "decoder_freeze_labels",
]


class TrainState(struct.PyTreeNode):
    """Minimal train state: params, BN stats, optimizer state, step, rng."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats, new_rng):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            step=self.step + 1,
            rng=new_rng,
        )


def freeze_labels(params, frozen_module: str) -> Any:
    """'frozen' for every param under ``frozen_module``, 'trainable'
    elsewhere."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "frozen"
        if any(getattr(p, "key", None) == frozen_module for p in path)
        else "trainable",
        params,
    )


def decoder_freeze_labels(params) -> Any:
    """'frozen' for every decoder param, 'trainable' elsewhere
    (reference freezes the decoder for stage 2, training/train.py:175)."""
    return freeze_labels(params, "decoder")


def _make_optimizer(train_cfg: TrainConfig, freeze: str | None, params=None):
    """freeze: None, 'decoder' (reference stage 2), or 'encoder'
    (frozen-encoder latent reuse for band-count transfer, BASELINE.json
    config 5)."""
    adam = optax.adam(train_cfg.learning_rate)
    if freeze is None:
        return adam
    return optax.multi_transform(
        {"trainable": adam, "frozen": optax.set_to_zero()},
        freeze_labels(params, freeze),
    )


def create_train_state(
    model: DeblenderVAE,
    train_cfg: TrainConfig | None = None,
    rng: jax.Array | None = None,
    freeze_decoder: bool = False,
    freeze: str | None = None,
    variables: Any | None = None,
) -> TrainState:
    train_cfg = train_cfg or TrainConfig()
    rng = rng if rng is not None else jax.random.PRNGKey(train_cfg.seed)
    init_rng, state_rng = jax.random.split(rng)
    if variables is None:
        variables = init_vae(model, init_rng)
    else:
        # The train steps donate the state's buffers (in-place updates);
        # copy caller-supplied arrays so the caller's variables — possibly
        # still serving inference — are never invalidated by training.
        variables = jax.tree_util.tree_map(jnp.array, variables)
    if freeze_decoder and freeze is None:
        freeze = "decoder"
    tx = _make_optimizer(train_cfg, freeze, variables["params"])
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=state_rng,
        tx=tx,
    )


def _kl_weight_at(step, train_cfg: TrainConfig):
    """Fixed 0.01 by default; optional linear beta-anneal extension."""
    w = jnp.asarray(train_cfg.kl_weight, jnp.float32)
    if train_cfg.kl_anneal_steps > 0:
        frac = jnp.minimum(step.astype(jnp.float32) / train_cfg.kl_anneal_steps, 1.0)
        return w * frac
    return w


def make_loss_fn(model: DeblenderVAE, train_cfg: TrainConfig) -> Callable:
    """(params, batch_stats, x, y, rng, step[, w]) -> (loss, (terms, new_bs)).

    Shared by the single-device and mesh-sharded step factories so loss
    semantics cannot drift between them.  ``w`` is the optional per-sample
    weight vector (see losses.elbo_terms)."""

    def loss_fn(params, batch_stats, x, y, rng, step, w=None):
        def fwd(m, x, rng):
            posterior = m.encode(x, train=True)
            z = posterior.sample(rng)
            dist = m.decode(z)
            return dist, posterior, z

        (dist, posterior, z), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            rng,
            method=fwd,
            mutable=["batch_stats"],
        )
        kl_w = _kl_weight_at(step, train_cfg)
        terms = losses.elbo_terms(
            dist, posterior, y, z=z, kl_weight=kl_w, kl_mode=train_cfg.kl_mode,
            weights=w,
        )
        return terms["loss"], (terms, mutated["batch_stats"])

    return loss_fn


def make_train_step(
    model: DeblenderVAE,
    train_cfg: TrainConfig | None = None,
    weighted: bool = False,
    donate: bool = True,
) -> Callable:
    """Build the jitted (state, x, y) -> (state, metrics) training step.

    With ``donate=True`` (default) the input state's buffers are donated to
    the step: params, Adam moments and BN stats are updated in place on
    device instead of being copied every step (~100 MB/step for the full
    model).  The old state object must then not be read after the call —
    keep only the returned state (the epoch loops here do exactly that).
    Callers that hold a reference to the pre-step state (e.g. a
    best-checkpoint pattern saving ``best = state`` before stepping) must
    pass ``donate=False`` or they will hit deleted-buffer errors.

    ``weighted=True`` builds a (state, x, y, w) step using per-sample
    weights (zero-weight rows contribute nothing to loss or gradient).
    """
    train_cfg = train_cfg or TrainConfig()
    loss_fn = make_loss_fn(model, train_cfg)
    donate_argnums = (0,) if donate else ()

    if weighted:

        @partial(jax.jit, donate_argnums=donate_argnums)
        def train_step_w(state: TrainState, x, y, w):
            rng, new_rng = jax.random.split(state.rng)
            grads, (terms, new_bs) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, x, y, rng, state.step, w
            )
            return state.apply_gradients(grads, new_bs, new_rng), terms

        return train_step_w

    @partial(jax.jit, donate_argnums=donate_argnums)
    def train_step(state: TrainState, x: jax.Array, y: jax.Array):
        rng, new_rng = jax.random.split(state.rng)
        grads, (terms, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, y, rng, state.step
        )
        new_state = state.apply_gradients(grads, new_bs, new_rng)
        return new_state, terms

    return train_step


def make_chunked_train_step(
    model: DeblenderVAE,
    train_cfg: TrainConfig | None = None,
    *,
    make_batch: Callable,
    chunk: int,
    donate: bool = True,
) -> Callable:
    """K training steps per device dispatch: ``lax.scan`` over a
    device-resident batch stream.

    When batches are *generated on device* (data/simulate.py — the
    reference's externally-simulated training sets have no bundled
    counterpart, SURVEY.md §2 row 19), a Python step loop pays one host
    dispatch per step; through a slow host link that dominates wall time
    (measured ~0.4 s/step vs ~7 ms of compute at batch 256).  Scanning
    ``chunk`` steps inside one jitted program removes the host from the
    loop entirely: dispatch cost amortizes 1/chunk and the stream stays
    in HBM.

    ``make_batch(key) -> (x, y)`` must be traceable (e.g. a closure over
    ``simulate_batch``); it is called once per scanned step with
    ``fold_in(base_key, i)``.  Returns a jitted
    ``(state, base_key) -> (state, terms)`` where each ``terms`` value has
    a leading (chunk,) axis (per-step metrics, fetch at eval points).

    Each scanned step is mathematically identical to
    :func:`make_train_step`'s (same loss_fn, same rng threading, same
    optimizer update; only the batch source differs).  The two compile as
    different XLA programs, so results agree to float epsilon rather than
    bitwise — reduction orders shift with fusion context (pinned at 1e-5
    over multi-step training by tests/test_training_extras.py).  Donation
    semantics match make_train_step: keep only the returned state.
    """
    train_cfg = train_cfg or TrainConfig()
    loss_fn = make_loss_fn(model, train_cfg)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def run_chunk(state: TrainState, base_key: jax.Array):
        def body(st, i):
            x, y = make_batch(jax.random.fold_in(base_key, i))
            rng, new_rng = jax.random.split(st.rng)
            grads, (terms, new_bs) = jax.grad(loss_fn, has_aux=True)(
                st.params, st.batch_stats, x, y, rng, st.step
            )
            return st.apply_gradients(grads, new_bs, new_rng), terms

        return jax.lax.scan(body, state, jnp.arange(chunk))

    return run_chunk


def make_eval_step(model: DeblenderVAE, train_cfg: TrainConfig | None = None):
    """Jitted validation step (BN in inference mode, sampled latent like the
    reference's Keras validation pass)."""
    train_cfg = train_cfg or TrainConfig()

    @jax.jit
    def eval_step(state: TrainState, x: jax.Array, y: jax.Array, rng: jax.Array):
        def fwd(m, x, rng):
            posterior = m.encode(x, train=False)
            z = posterior.sample(rng)
            dist = m.decode(z)
            return dist, posterior, z

        dist, posterior, z = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            rng,
            method=fwd,
        )
        return losses.elbo_terms(
            dist, posterior, y, z=z,
            kl_weight=train_cfg.kl_weight, kl_mode=train_cfg.kl_mode,
        )

    return eval_step


def _batches(
    n: int,
    batch_size: int,
    rng: np.random.Generator | None,
    drop_remainder: bool = False,
):
    """Index blocks of ``batch_size``; the trailing partial block is yielded
    unless ``drop_remainder``.  Training includes the partial batch (Keras
    ``fit`` semantics, reference training/train.py:27-37 — one extra jit
    specialization for the tail shape); validation drops it (the reference
    caps validation at ``int(n/bs)`` full batches, training/train.py:33)."""
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    for start in range(0, n, batch_size):
        block = idx[start : start + batch_size]
        if drop_remainder and len(block) < batch_size:
            return
        yield block


def _make_step_runners(model, train_cfg, batch_size, mesh):
    """Build (run_train, run_eval, maybe_shard_state) closures.

    mesh=None: the plain single-device jitted steps; the trailing partial
    batch runs at its natural (smaller) shape, exactly like Keras ``fit``.

    mesh set: the sharded steps from parallel/sharded.py.  Batches whose
    length is divisible by the mesh 'data' axis run the unweighted step
    (bitwise-comparable to the single-device path); others are zero-padded
    up to the next multiple and run a weighted step so pad rows drop out of
    loss, gradient and metrics.  (Pad rows do still enter train-mode
    BatchNorm batch statistics — documented in PARITY.md.)
    """
    if mesh is None:
        train_step = make_train_step(model, train_cfg)
        eval_step = make_eval_step(model, train_cfg)

        def run_train(state, bx, by):
            return train_step(
                state, jnp.asarray(bx, jnp.float32), jnp.asarray(by, jnp.float32)
            )

        def run_eval(state, bx, by, rng):
            return eval_step(
                state, jnp.asarray(bx, jnp.float32), jnp.asarray(by, jnp.float32), rng
            )

        return run_train, run_eval, lambda state: state

    # Lazy import: parallel/sharded.py imports this module.
    from debvader_tpu.parallel import mesh as mesh_lib
    from debvader_tpu.parallel.sharded import (
        make_sharded_eval_step,
        make_sharded_train_step,
        shard_train_state,
    )

    dp = mesh.shape[mesh_lib.DATA_AXIS]
    batch_s = mesh_lib.batch_sharding(mesh)
    plain_step = make_sharded_train_step(model, mesh, train_cfg)
    steps = {"train_w": None, "eval_w": None}

    def put(a):
        return jax.device_put(jnp.asarray(a, jnp.float32), batch_s)

    def pad_weighted(bx, by):
        n = len(bx)
        m = -(-n // dp) * dp
        w = np.zeros((m,), np.float32)
        w[:n] = 1.0
        if m != n:
            pad = ((0, m - n),) + ((0, 0),) * (np.ndim(bx) - 1)
            bx = np.pad(np.asarray(bx, np.float32), pad)
            by = np.pad(np.asarray(by, np.float32), pad)
        return put(bx), put(by), put(w)

    def run_train(state, bx, by):
        if len(bx) % dp == 0:
            return plain_step(state, put(bx), put(by))
        if steps["train_w"] is None:
            steps["train_w"] = make_sharded_train_step(
                model, mesh, train_cfg, weighted=True
            )
        return steps["train_w"](state, *pad_weighted(bx, by))

    def run_eval(state, bx, by, rng):
        if steps["eval_w"] is None:
            steps["eval_w"] = make_sharded_eval_step(model, mesh, train_cfg)
        return steps["eval_w"](state, *pad_weighted(bx, by), rng)

    return run_train, run_eval, lambda state: shard_train_state(state, mesh)


def train_network(
    model: DeblenderVAE,
    state: TrainState,
    epochs: int,
    training_data: tuple,
    validation_data: tuple,
    batch_size: int,
    callbacks: Iterable | None = None,
    verbose: int = 1,
    train_cfg: TrainConfig | None = None,
    mesh=None,
    metrics_log=None,
):
    """Epoch loop mirroring the reference train_network (training/train.py:11-39).

    ``training_data`` / ``validation_data`` are (inputs, labels) numpy pairs.
    Returns (state, history) where history is a Keras-History-like dict.

    ``mesh``: a ``jax.sharding.Mesh`` (parallel.make_mesh) — training runs
    data-parallel over its 'data' axis (and tensor-parallel over 'model' if
    present), with XLA inserting the ICI collectives.  BASELINE config 3
    ("data-parallel over 8 chips") is ``train_network(..., mesh=make_mesh())``.

    ``metrics_log``: a ``utils.profiling.MetricsLog`` (or a str/Path for a
    JSONL file) receiving one structured record per epoch in addition to the
    returned history.
    """
    train_cfg = train_cfg or TrainConfig()
    run_train, run_eval, shard_state = _make_step_runners(
        model, train_cfg, batch_size, mesh
    )
    state = shard_state(state)
    shuffle_rng = np.random.default_rng(train_cfg.seed)
    if isinstance(metrics_log, (str, bytes)) or hasattr(metrics_log, "__fspath__"):
        from debvader_tpu.utils.profiling import MetricsLog

        metrics_log = MetricsLog(metrics_log)

    # ``training_data`` may be an (inputs, labels) array pair like the
    # reference, or any loader with next_batch()/__len__ — e.g. the native
    # C++ prefetching loader (runtime/loader.py) for on-disk archives.
    use_loader = hasattr(training_data, "next_batch")
    if not use_loader:
        x_tr, y_tr = training_data
    x_va, y_va = validation_data
    history: dict[str, list[float]] = {}

    for epoch in range(epochs):
        # Metrics stay on device (running sums) and are fetched once per
        # epoch — a float() per step would force a device->host sync that
        # stalls the dispatch pipeline on every batch.
        # Per-batch means are weighted by batch size so the trailing
        # partial batch contributes per-sample, matching Keras fit's
        # sample-weighted epoch averages (reference training/train.py:27-37)
        # — with equal weights a 1-stamp tail would count like a full batch.
        sums: dict[str, jax.Array] | None = None
        n_samples = 0
        if use_loader:
            for _ in range(len(training_data)):
                bx, by = training_data.next_batch()
                state, terms = run_train(state, bx, by)
                b = len(bx)
                terms = jax.tree_util.tree_map(lambda t: t * b, terms)
                sums = terms if sums is None else jax.tree_util.tree_map(
                    jnp.add, sums, terms
                )
                n_samples += b
        else:
            for idx in _batches(
                len(x_tr), batch_size, shuffle_rng if train_cfg.shuffle else None
            ):
                state, terms = run_train(state, x_tr[idx], y_tr[idx])
                b = len(idx)
                terms = jax.tree_util.tree_map(lambda t: t * b, terms)
                sums = terms if sums is None else jax.tree_util.tree_map(
                    jnp.add, sums, terms
                )
                n_samples += b

        val_sums: dict[str, jax.Array] | None = None
        n_val = 0
        val_rng = jax.random.fold_in(jax.random.PRNGKey(train_cfg.seed), epoch)
        # int(n/bs) full batches like the reference's validation_steps
        # (training/train.py:33) — except when the val set is smaller than
        # one batch, where the reference passes a fractional
        # validation_steps < 1 that Keras cannot run (degenerate config):
        # we evaluate the one partial batch instead of nothing, so best-val
        # checkpointing still works on tiny validation sets (PARITY.md #6).
        n_val_steps = max(int(len(x_va) / batch_size), 1)
        for i, idx in enumerate(
            _batches(len(x_va), batch_size, None, drop_remainder=len(x_va) >= batch_size)
        ):
            if i >= n_val_steps:
                break
            terms = run_eval(
                state, x_va[idx], y_va[idx], jax.random.fold_in(val_rng, i)
            )
            val_sums = terms if val_sums is None else jax.tree_util.tree_map(
                jnp.add, val_sums, terms
            )
            n_val += 1

        logs = (
            {k: float(v) / n_samples for k, v in jax.device_get(sums).items()}
            if sums
            else {}
        )
        if val_sums:
            logs.update(
                {
                    f"val_{k}": float(v) / n_val
                    for k, v in jax.device_get(val_sums).items()
                }
            )
        for k, v in logs.items():
            history.setdefault(k, []).append(v)
        if verbose == 1:
            msg = " ".join(f"{k}={v:.4f}" for k, v in logs.items())
            print(f"epoch {epoch + 1}/{epochs}: {msg}")
        if metrics_log is not None:
            metrics_log.log(epoch, **logs)
        for cb in callbacks or []:
            cb.on_epoch_end(epoch, logs, state)

    return state, history


def train_deblender(
    survey_name: str,
    from_survey: str | None,
    epochs: int,
    training_data_vae: tuple,
    validation_data_vae: tuple,
    training_data_deblender: tuple,
    validation_data_deblender: tuple,
    nb_of_bands: int = 6,
    channel_last: bool = True,
    batch_size: int = 5,
    with_callbacks: bool = False,
    verbose: int = 2,
    train_cfg: TrainConfig | None = None,
    model_cfg: ModelConfig | None = None,
    weights_dir: str | None = None,
    mesh=None,
    metrics_log=None,
):
    """Two-stage transfer trainer, signature-compatible with the reference
    train_deblender (training/train.py:78-205).

    Returns (hist_vae, hist_deblender, state, model).

    ``mesh``: run both stages data-parallel over a device mesh (BASELINE
    config 3 is ``train_deblender(..., mesh=parallel.make_mesh())``); the
    stage-2 decoder freeze and checkpoint callbacks behave identically.

    ``from_survey`` with a checkpoint whose band count differs from
    ``nb_of_bands`` warm-starts through ``transfer.transfer_band_count``
    (BASELINE config 5) instead of failing: band-independent weights carry
    over, band-shaped layers reinitialize.  (The reference's same-band-only
    warm start is training/train.py:145-154.)
    """
    from debvader_tpu.training import checkpoint as ckpt

    model_cfg = model_cfg or ModelConfig(nb_of_bands=nb_of_bands)
    train_cfg = train_cfg or TrainConfig(batch_size=batch_size)
    model = DeblenderVAE(model_cfg)

    # Channel-count validation (reference training/train.py:133-142)
    data_axis = -1 if channel_last else 2
    if np.shape(training_data_vae[0])[data_axis] != nb_of_bands:
        raise ValueError(
            "The number of bands in the data does not correspond to the "
            "number of filters in the network."
        )

    state = create_train_state(model, train_cfg)

    # Warm start from another survey's weights (training/train.py:145-154).
    # A band-count mismatch goes through transfer_band_count (BASELINE
    # config 5) rather than a shape error.
    if from_survey is not None:
        from debvader_tpu.training.transfer import (
            checkpoint_band_count,
            transfer_band_count,
        )

        restored = ckpt.load_weights(from_survey, weights_dir=weights_dir)
        if checkpoint_band_count(restored) != nb_of_bands:
            restored = transfer_band_count(
                restored, model_cfg, rng=jax.random.PRNGKey(train_cfg.seed)
            )
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )

    callbacks_vae = (
        ckpt.define_callbacks("vae", survey_name, weights_dir=weights_dir)
        if with_callbacks
        else None
    )
    state, hist_vae = train_network(
        model, state, epochs, training_data_vae, validation_data_vae,
        batch_size, callbacks_vae, verbose, train_cfg, mesh=mesh,
        metrics_log=metrics_log,
    )

    # Stage 2: fresh optimizer with the decoder frozen
    state2 = create_train_state(
        model,
        train_cfg,
        rng=state.rng,
        freeze_decoder=True,
        variables={"params": state.params, "batch_stats": state.batch_stats},
    )
    callbacks_debl = (
        ckpt.define_callbacks("deblender", survey_name, weights_dir=weights_dir)
        if with_callbacks
        else None
    )
    state2, hist_deblender = train_network(
        model, state2, epochs, training_data_deblender, validation_data_deblender,
        batch_size, callbacks_debl, verbose, train_cfg, mesh=mesh,
        metrics_log=metrics_log,
    )

    return hist_vae, hist_deblender, state2, model
