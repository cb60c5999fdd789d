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
from pathlib import Path
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
    "make_epoch_scan_train_step",
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


def make_superbatch_train_step(
    model: DeblenderVAE,
    train_cfg: TrainConfig | None = None,
    *,
    steps: int,
    mesh=None,
    gather: bool = False,
    donate: bool = True,
) -> Callable:
    """``steps`` training steps per device dispatch over uploaded data
    (VERDICT r3 #3 — the host-data counterpart of make_chunked_train_step).

    A Python step loop pays one host dispatch per step; through a slow host
    link that is ~0.4 s of latency per ~7 ms step.  The reference's hot loop
    is ``net.fit`` (training/train.py:27-37), which batches dispatches
    internally; the TPU-native form scans K steps inside one jitted program:

    - ``gather=False``: ``(state, xs, ys) -> (state, summed_terms)`` where
      xs/ys are (K, bs, ...) superbatches — upload once, scan K steps.
    - ``gather=True``: ``(state, x_all, y_all, idx) -> (state, summed_terms)``
      where x_all/y_all are the *device-resident dataset* and idx is a tiny
      (K, bs) int32 batch-index array — per-dispatch upload is just the
      indices, so host-data training runs at the on-device step rate once
      the dataset has been placed in HBM (train_network does this
      automatically when it fits).

    Each scanned step is mathematically identical to make_train_step's
    (same loss_fn, rng threading, optimizer update); the two compile as
    different XLA programs so results agree to float epsilon, not bitwise
    (pinned by tests/test_training_extras.py).  ``summed_terms`` are the
    per-step metric dicts summed over the K steps on device (all steps are
    full ``bs``-row batches, so the caller weights by ``bs``).

    With ``mesh`` the per-step batch is sharded over the 'data' axis exactly
    like make_sharded_train_step (XLA inserts the gradient reductions);
    gather mode is single-device only — arbitrary shuffled gathers from a
    row-sharded resident dataset would be an all-to-all per step.
    """
    train_cfg = train_cfg or TrainConfig()
    loss_fn = make_loss_fn(model, train_cfg)
    if mesh is not None and gather:
        raise ValueError("gather=True is single-device only; use superbatches")
    batch_s = None
    if mesh is not None:
        from debvader_tpu.parallel import mesh as mesh_lib

        batch_s = mesh_lib.batch_sharding(mesh)

    def body_step(st, x, y):
        if batch_s is not None:
            x = jax.lax.with_sharding_constraint(x, batch_s)
            y = jax.lax.with_sharding_constraint(y, batch_s)
        rng, new_rng = jax.random.split(st.rng)
        grads, (terms, new_bs) = jax.grad(loss_fn, has_aux=True)(
            st.params, st.batch_stats, x, y, rng, st.step
        )
        return st.apply_gradients(grads, new_bs, new_rng), terms

    donate_argnums = (0,) if donate else ()

    if gather:

        @partial(jax.jit, donate_argnums=donate_argnums)
        def run_gather(state: TrainState, x_all, y_all, idx):
            def body(st, ix):
                return body_step(st, jnp.take(x_all, ix, axis=0),
                                 jnp.take(y_all, ix, axis=0))

            state, terms = jax.lax.scan(body, state, idx)
            return state, jax.tree_util.tree_map(lambda t: t.sum(0), terms)

        return run_gather

    @partial(jax.jit, donate_argnums=donate_argnums)
    def run_super(state: TrainState, xs, ys):
        state, terms = jax.lax.scan(
            lambda st, xy: body_step(st, *xy), state, (xs, ys)
        )
        return state, jax.tree_util.tree_map(lambda t: t.sum(0), terms)

    return run_super


def make_epoch_scan_train_step(
    model: DeblenderVAE,
    train_cfg: TrainConfig | None = None,
    *,
    track_monitors: tuple = (),
    donate: bool = True,
) -> Callable:
    """ALL epochs in ONE device dispatch (VERDICT r4 #8): nested lax.scan —
    epochs over (steps, then validation batches) — over a device-resident
    dataset, with per-epoch metric sums and device-side best-validation
    state tracking, so the per-epoch host syncs the K-step path still paid
    (epoch-metrics fetch + validation dispatches, measured ~5.5 s/epoch
    through this environment's tunnel, BASELINE.md r4) collapse to one
    dispatch and one fetch for the whole fit.

    Returns a jitted ``(state, x_all, y_all, idx, xs_va, ys_va, val_seed)
    -> (state, epoch_terms, val_terms, best)`` where

    - ``idx`` is (E, S, B) int32: per-epoch shuffled batch indices into the
      resident dataset (gather mode, single device);
    - ``xs_va``/``ys_va`` are (V, vb, ...) pre-blocked validation batches;
    - ``epoch_terms``/``val_terms`` have a leading (E,) axis (sums over the
      epoch's steps / validation batches);
    - ``best`` maps each metric in ``track_monitors`` (e.g. 'loss', 'mse')
      to ``(best_val, params, batch_stats)`` — the state at the epoch that
      minimized that VALIDATION metric, tracked with jnp.where inside the
      scan (this is what lets best-val checkpointing survive without a
      host round-trip per epoch).

    Validation rng matches the per-epoch path exactly:
    ``fold_in(fold_in(PRNGKey(seed), epoch), batch_i)`` with BN in
    inference mode.  Training steps are make_train_step's arithmetic (same
    loss_fn, rng threading, optimizer update) in a different XLA program —
    float-epsilon parity, pinned in tests/test_training_extras.py.
    """
    train_cfg = train_cfg or TrainConfig()
    loss_fn = make_loss_fn(model, train_cfg)

    def train_body(st, ix, x_all, y_all):
        x = jnp.take(x_all, ix, axis=0)
        y = jnp.take(y_all, ix, axis=0)
        rng, new_rng = jax.random.split(st.rng)
        grads, (terms, new_bs) = jax.grad(loss_fn, has_aux=True)(
            st.params, st.batch_stats, x, y, rng, st.step
        )
        return st.apply_gradients(grads, new_bs, new_rng), terms

    def eval_terms(st, x, y, rng):
        def fwd(m, x, rng):
            posterior = m.encode(x, train=False)
            z = posterior.sample(rng)
            dist = m.decode(z)
            return dist, posterior, z

        dist, posterior, z = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats}, x, rng,
            method=fwd,
        )
        return losses.elbo_terms(
            dist, posterior, y, z=z,
            kl_weight=train_cfg.kl_weight, kl_mode=train_cfg.kl_mode,
        )

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def run_epochs(state, x_all, y_all, idx, xs_va, ys_va, val_seed):
        n_val = xs_va.shape[0]

        def init_best(st):
            return {
                m: (jnp.inf, st.params, st.batch_stats)
                for m in track_monitors
            }

        def epoch_body(carry, e_and_idx):
            st, best = carry
            e, idx_e = e_and_idx
            st, terms = jax.lax.scan(
                lambda s, ix: train_body(s, ix, x_all, y_all), st, idx_e
            )
            terms = jax.tree_util.tree_map(lambda t: t.sum(0), terms)
            val_rng = jax.random.fold_in(jax.random.PRNGKey(val_seed), e)
            _, vterms = jax.lax.scan(
                lambda _, ixy: (
                    None,
                    eval_terms(
                        st, ixy[0], ixy[1], jax.random.fold_in(val_rng, ixy[2])
                    ),
                ),
                None,
                (xs_va, ys_va, jnp.arange(n_val)),
            )
            vterms = jax.tree_util.tree_map(lambda t: t.sum(0), vterms)
            new_best = {}
            for m, (bv, bp, bbs) in best.items():
                cur = vterms[m] / n_val
                better = cur < bv
                pick = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
                    lambda u, v: jnp.where(better, u, v), a, b
                )
                new_best[m] = (
                    jnp.where(better, cur, bv),
                    pick(st.params, bp),
                    pick(st.batch_stats, bbs),
                )
            return (st, new_best), (terms, vterms)

        (state, best), (terms_e, vterms_e) = jax.lax.scan(
            epoch_body,
            (state, init_best(state)),
            (jnp.arange(idx.shape[0]), idx),
        )
        return state, terms_e, vterms_e, best

    return run_epochs


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


def _train_scanned_epochs(
    model, state, epochs, x_tr, y_tr, x_va, y_va, batch_size, callbacks,
    verbose, train_cfg, metrics_log, shuffle_rng, *, use_loader, mesh,
    history,
):
    """train_network's scan_epochs=True path: one dispatch for the whole
    fit (see make_epoch_scan_train_step), then a host-side replay that
    reconstructs the per-epoch logs/history/callback behavior from the
    (E,)-stacked metric arrays and the device-tracked best-val states."""
    from debvader_tpu.training.checkpoint import save_weights

    if use_loader or mesh is not None:
        raise ValueError(
            "scan_epochs requires in-memory array data on a single device "
            "(no loader, no mesh)"
        )
    n = len(x_tr)
    if n % batch_size:
        raise ValueError(
            f"scan_epochs needs len(training_data) % batch_size == 0 for "
            f"static scanned shapes, got {n} % {batch_size} — trim or pad "
            f"the training set, or use steps_per_dispatch instead"
        )
    cbs = list(callbacks or [])
    for cb in cbs:
        if not (hasattr(cb, "monitor") and hasattr(cb, "directory")):
            raise ValueError(
                "scan_epochs supports BestValCheckpoint-shaped callbacks "
                f"only (monitor + directory); got {type(cb).__name__}"
            )
    monitors = sorted(
        {
            cb.monitor[4:] if cb.monitor.startswith("val_") else cb.monitor
            for cb in cbs
        }
    )

    steps = n // batch_size
    idx = np.empty((epochs, steps, batch_size), np.int32)
    for e in range(epochs):
        blocks = list(
            _batches(n, batch_size, shuffle_rng if train_cfg.shuffle else None)
        )
        idx[e] = np.stack(blocks)

    # validation blocks, mirroring the per-epoch path's drop-remainder rule
    n_val_steps = max(int(len(x_va) / batch_size), 1)
    vblocks = [
        b
        for i, b in enumerate(
            _batches(
                len(x_va), batch_size, None,
                drop_remainder=len(x_va) >= batch_size,
            )
        )
        if i < n_val_steps
    ]
    xs_va = jnp.asarray(
        np.stack([np.asarray(x_va[b], np.float32) for b in vblocks])
    )
    ys_va = jnp.asarray(
        np.stack([np.asarray(y_va[b], np.float32) for b in vblocks])
    )

    run = make_epoch_scan_train_step(
        model, train_cfg, track_monitors=tuple(monitors)
    )
    state, terms_e, vterms_e, best = run(
        state,
        jnp.asarray(x_tr, jnp.float32),
        jnp.asarray(y_tr, jnp.float32),
        jnp.asarray(idx),
        xs_va,
        ys_va,
        int(train_cfg.seed),
    )

    # ONE host fetch for the whole fit's metrics
    terms_h, vterms_h = jax.device_get((terms_e, vterms_e))
    n_v = len(vblocks)
    initial_best = {id(cb): cb.best for cb in cbs}
    for e in range(epochs):
        logs = {k: float(v[e]) / steps for k, v in terms_h.items()}
        logs.update({f"val_{k}": float(v[e]) / n_v for k, v in vterms_h.items()})
        for k, v in logs.items():
            history.setdefault(k, []).append(v)
        if verbose == 1:
            msg = " ".join(f"{k}={v:.4f}" for k, v in logs.items())
            print(f"epoch {e + 1}/{epochs}: {msg}")
        if metrics_log is not None:
            metrics_log.log(e, **logs)
        for cb in cbs:
            cur = logs.get(cb.monitor)
            if cur is not None and cur < cb.best:
                if getattr(cb, "verbose", 0):
                    print(
                        f"epoch {e + 1}: {cb.monitor} improved "
                        f"{cb.best:.5f} -> {cur:.5f}, saving to {cb.directory}"
                    )
                cb.best = cur
    # persist each callback's device-tracked best state (the state at its
    # argmin epoch — identical to what per-epoch on_epoch_end would have
    # saved last)
    for cb in cbs:
        key = cb.monitor[4:] if cb.monitor.startswith("val_") else cb.monitor
        bv, bp, bbs = best[key]
        if float(bv) < initial_best[id(cb)]:
            save_weights(
                Path(cb.directory) / "ckpt",
                {"params": bp, "batch_stats": bbs},
            )
    return state, history


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
    steps_per_dispatch: int = 1,
    device_dataset: bool | None = None,
    scan_epochs: bool = False,
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

    ``steps_per_dispatch``: scan K full-size batches per device dispatch
    (make_superbatch_train_step) instead of one Python dispatch per batch —
    the host-data form of the chunked trainer.  Batch order, shuffling, rng
    threading and sample-weighted epoch metrics are unchanged (the trailing
    partial batch still runs per-step at its natural shape); results match
    the per-step path to float epsilon rather than bitwise, since the
    scanned step compiles as a different XLA program.

    ``device_dataset``: with steps_per_dispatch > 1 and array training data,
    place the whole training set in HBM once and scan over uploaded batch
    *indices* (gather mode) so per-dispatch host traffic is a few KB.  None
    = auto (single-device, dataset <= 4 GB); ignored for loaders.  With
    ``mesh`` the superbatch path is used instead (sharded over 'data';
    requires batch_size divisible by the data axis).

    ``scan_epochs``: run the ENTIRE fit — every epoch's training steps AND
    its validation pass, with device-side best-val state tracking — as one
    device dispatch (make_epoch_scan_train_step), eliminating the per-epoch
    host syncs the K-step path still pays (measured ~5.5 s/epoch through
    this environment's tunnel; BASELINE.md r5 for the measured end-to-end
    gain).  Requires array data on a single device (no mesh/loader), a
    training-set size divisible by batch_size, and callbacks that are
    BestValCheckpoint-shaped (monitor + directory); epoch logs, history,
    metrics_log records and best-val checkpoint files match the per-epoch
    path (float-epsilon on metrics — different XLA program).
    """
    train_cfg = train_cfg or TrainConfig()
    run_train, run_eval, shard_state = _make_step_runners(
        model, train_cfg, batch_size, mesh
    )
    state = shard_state(state)
    shuffle_rng = np.random.default_rng(train_cfg.seed)
    spd = int(steps_per_dispatch)
    if spd < 1:
        raise ValueError(f"steps_per_dispatch must be >= 1, got {spd}")
    if spd > 1 and mesh is not None:
        from debvader_tpu.parallel import mesh as mesh_lib

        if batch_size % mesh.shape[mesh_lib.DATA_AXIS]:
            raise ValueError(
                "steps_per_dispatch with mesh requires batch_size divisible "
                f"by the data axis ({mesh.shape[mesh_lib.DATA_AXIS]})"
            )
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

    if scan_epochs:
        return _train_scanned_epochs(
            model, state, epochs,
            None if use_loader else x_tr, None if use_loader else y_tr,
            x_va, y_va, batch_size,
            callbacks, verbose, train_cfg, metrics_log, shuffle_rng,
            use_loader=use_loader, mesh=mesh, history=history,
        )

    # --- steps_per_dispatch machinery -------------------------------------
    x_dev = y_dev = None
    if spd > 1 and not use_loader:
        if device_dataset is None:
            device_dataset = (
                mesh is None
                and np.asarray(x_tr).nbytes + np.asarray(y_tr).nbytes
                <= (4 << 30)
            )
        if device_dataset:
            if mesh is not None:
                raise ValueError(
                    "device_dataset gather mode is single-device only"
                )
            x_dev = jnp.asarray(x_tr, jnp.float32)
            y_dev = jnp.asarray(y_tr, jnp.float32)
    scan_cache: dict[int, Callable] = {}

    def run_scan(state, chunk):
        """Scan len(chunk) full batches in one dispatch; returns
        (state, terms summed over the chunk's steps)."""
        g = len(chunk)
        if g not in scan_cache:
            scan_cache[g] = make_superbatch_train_step(
                model, train_cfg, steps=g, mesh=mesh, gather=x_dev is not None
            )
        fn = scan_cache[g]
        if x_dev is not None:
            idxm = jnp.asarray(np.stack(chunk).astype(np.int32))
            return fn(state, x_dev, y_dev, idxm)
        flat = np.concatenate(chunk)
        bx = np.asarray(x_tr[flat], np.float32).reshape(
            g, batch_size, *np.shape(x_tr)[1:]
        )
        by = np.asarray(y_tr[flat], np.float32).reshape(
            g, batch_size, *np.shape(y_tr)[1:]
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sb = NamedSharding(mesh, PartitionSpec(None, "data"))
            return fn(state, jax.device_put(bx, sb), jax.device_put(by, sb))
        return fn(state, jnp.asarray(bx), jnp.asarray(by))

    # ----------------------------------------------------------------------

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

        def add_terms(terms, mult, n):
            """sums += terms * mult; n_samples += n.  Per-step calls pass
            (terms, b, b); scan calls pass step-summed terms with
            (terms, batch_size, g * batch_size) — every scanned step is a
            full batch, so the per-sample weighting matches the per-step
            path exactly."""
            nonlocal sums, n_samples
            terms = jax.tree_util.tree_map(lambda t: t * mult, terms)
            sums = terms if sums is None else jax.tree_util.tree_map(
                jnp.add, sums, terms
            )
            n_samples += n

        if use_loader:
            buf_x: list = []
            buf_y: list = []

            def flush_buf(state):
                if not buf_x:
                    return state
                g = len(buf_x)
                if g not in scan_cache:
                    scan_cache[g] = make_superbatch_train_step(
                        model, train_cfg, steps=g, mesh=mesh
                    )
                bx = np.stack([np.asarray(b, np.float32) for b in buf_x])
                by = np.stack([np.asarray(b, np.float32) for b in buf_y])
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec

                    sb = NamedSharding(mesh, PartitionSpec(None, "data"))
                    bx, by = jax.device_put(bx, sb), jax.device_put(by, sb)
                else:
                    bx, by = jnp.asarray(bx), jnp.asarray(by)
                state, terms = scan_cache[g](state, bx, by)
                add_terms(terms, batch_size, g * batch_size)
                buf_x.clear()
                buf_y.clear()
                return state

            for _ in range(len(training_data)):
                bx, by = training_data.next_batch()
                if spd > 1 and len(bx) == batch_size:
                    buf_x.append(bx)
                    buf_y.append(by)
                    if len(buf_x) == spd:
                        state = flush_buf(state)
                    continue
                # odd-shaped batch: preserve order — flush, then per-step
                state = flush_buf(state)
                state, terms = run_train(state, bx, by)
                add_terms(terms, len(bx), len(bx))
            state = flush_buf(state)
        else:
            blocks = list(
                _batches(
                    len(x_tr), batch_size,
                    shuffle_rng if train_cfg.shuffle else None,
                )
            )
            if spd > 1:
                full = [b for b in blocks if len(b) == batch_size]
                blocks = [b for b in blocks if len(b) < batch_size]
                for start in range(0, len(full), spd):
                    chunk = full[start : start + spd]
                    state, terms = run_scan(state, chunk)
                    add_terms(terms, batch_size, len(chunk) * batch_size)
            for idx in blocks:
                state, terms = run_train(state, x_tr[idx], y_tr[idx])
                add_terms(terms, len(idx), len(idx))

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
    steps_per_dispatch: int = 1,
    device_dataset: bool | None = None,
    scan_epochs: bool = False,
):
    """Two-stage transfer trainer, signature-compatible with the reference
    train_deblender (training/train.py:78-205).

    Returns (hist_vae, hist_deblender, state, model).

    ``steps_per_dispatch`` / ``device_dataset`` thread through to both
    stages' epoch loops (train_network): scan K full batches per device
    dispatch, optionally with the datasets resident in HBM — the
    host-data throughput lever (BASELINE.md r4).

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
        metrics_log=metrics_log, steps_per_dispatch=steps_per_dispatch,
        device_dataset=device_dataset, scan_epochs=scan_epochs,
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
        metrics_log=metrics_log, steps_per_dispatch=steps_per_dispatch,
        device_dataset=device_dataset, scan_epochs=scan_epochs,
    )

    return hist_vae, hist_deblender, state2, model
