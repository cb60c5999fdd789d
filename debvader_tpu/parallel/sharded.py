"""Sharded training and inference over a device mesh.

Data-parallel ELBO training (BASELINE.json config 3: "data-parallel over 8
chips") expressed the XLA-native way: annotate shardings on the jitted step's
inputs/outputs and let the compiler insert the gradient reductions over ICI —
no hand-written collectives on the hot path.  Tensor parallelism for the
heavy dense kernels comes from ``param_shardings`` (parallel/mesh.py).

``make_sharded_train_step`` returns a step function whose state lives
sharded on the mesh; batches are placed with ``shard_batch``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from debvader_tpu.config import TrainConfig
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.parallel import mesh as mesh_lib
from debvader_tpu.training import losses
from debvader_tpu.training.train import TrainState, create_train_state

__all__ = [
    "shard_batch",
    "shard_train_state",
    "create_sharded_train_state",
    "make_sharded_train_step",
    "make_sharded_eval_step",
    "make_sharded_apply",
    "sharded_forward",
]


def shard_batch(batch: jax.Array, mesh) -> jax.Array:
    return jax.device_put(batch, mesh_lib.batch_sharding(mesh))


def sharded_forward(apply_fn, variables, x, rng, mesh, normalise: bool = False):
    """One mesh-sharded deblend forward with the full pre/post pipeline:
    optional normalize -> pad the batch to a multiple of the 'data' axis ->
    shard -> apply -> optional delta-method denormalize -> un-pad.

    The single place this logic lives — DeblendField's sharded path and
    deblend_samples' epistemic fan-out both call it, so padding/
    normalization semantics cannot drift apart.  ``apply_fn`` comes from
    ``make_sharded_apply``.  Returns the PixelNormal over the original
    ``x.shape[0]`` rows.
    """
    import jax.numpy as jnp

    from debvader_tpu.models.distributions import PixelNormal
    from debvader_tpu.ops.normalize import (
        denormalize_distribution,
        normalize_non_linear,
    )

    n = x.shape[0]
    x = jnp.where(jnp.isfinite(x), x, 0.0)  # same guard as deblend_jit
    if normalise:
        x = normalize_non_linear(x)
    pad = (-n) % mesh.shape["data"]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    dist = apply_fn(variables, shard_batch(x, mesh), rng)
    if normalise:
        dist = denormalize_distribution(dist)
    return PixelNormal(dist.loc[:n], dist.scale[:n])


def create_sharded_train_state(
    model: DeblenderVAE,
    mesh,
    train_cfg: TrainConfig | None = None,
    rng: jax.Array | None = None,
    freeze_decoder: bool = False,
    freeze: str | None = None,
    variables: Any | None = None,
) -> TrainState:
    """Initialize a TrainState with params/opt-state laid out on the mesh."""
    state = create_train_state(
        model, train_cfg, rng=rng, freeze_decoder=freeze_decoder, freeze=freeze,
        variables=variables,
    )
    return shard_train_state(state, mesh)


def shard_train_state(state: TrainState, mesh) -> TrainState:
    """Place an existing TrainState on the mesh (params TP-sharded per
    param_shardings, BN stats / step / rng replicated, Adam moments sharded
    like their params).  Idempotent — re-placing a sharded state is a no-op
    device_put."""
    p_shard = mesh_lib.param_shardings(state.params, mesh)
    rep = mesh_lib.replicated(mesh)

    def put(x, s):
        return jax.device_put(x, s)

    # Adam state (m/v) mirrors the params tree; shard any leaf whose shape
    # matches a TP-sharded param so update math stays local to each shard.
    tp_shapes = {
        tuple(p.shape)
        for p, s in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(p_shard),
        )
        if s.spec != P()
    }

    def p_shard_for(leaf):
        if hasattr(leaf, "shape") and tuple(leaf.shape) in tp_shapes:
            return NamedSharding(mesh, P(None, mesh_lib.MODEL_AXIS))
        return rep

    return state.replace(
        params=jax.tree_util.tree_map(put, state.params, p_shard),
        batch_stats=jax.tree_util.tree_map(lambda x: put(x, rep), state.batch_stats),
        opt_state=jax.tree_util.tree_map(
            lambda x: put(x, p_shard_for(x)) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
        step=put(state.step, rep),
        rng=put(state.rng, rep),
    )


def make_sharded_train_step(
    model: DeblenderVAE,
    mesh,
    train_cfg: TrainConfig | None = None,
    weighted: bool = False,
    donate: bool = True,
) -> Callable:
    """Jitted (state, x, y[, w]) -> (state, metrics) with batch sharded over
    'data'.  Gradient all-reduce and TP collectives are inserted by XLA.

    ``weighted=True`` adds a per-sample weight vector (losses.elbo_terms):
    zero-weight pad rows drop out of loss/gradient/metrics, letting callers
    pad batches to a multiple of the data axis.

    ``donate=False`` disables state-buffer donation for callers that keep a
    reference to the pre-step state (see make_train_step)."""
    train_cfg = train_cfg or TrainConfig()
    from debvader_tpu.training.train import make_loss_fn

    loss_fn = make_loss_fn(model, train_cfg)
    batch_s = mesh_lib.batch_sharding(mesh)
    donate_argnums = (0,) if donate else ()

    # State buffers are donated (updated in place on each chip) — keep only
    # the returned state, as make_train_step documents.
    if weighted:

        @partial(jax.jit, donate_argnums=donate_argnums)
        def step_w(state: TrainState, x, y, w):
            x = jax.lax.with_sharding_constraint(x, batch_s)
            y = jax.lax.with_sharding_constraint(y, batch_s)
            w = jax.lax.with_sharding_constraint(w, batch_s)
            rng, new_rng = jax.random.split(state.rng)
            grads, (terms, new_bs) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, x, y, rng, state.step, w
            )
            return state.apply_gradients(grads, new_bs, new_rng), terms

        return step_w

    @partial(jax.jit, donate_argnums=donate_argnums)
    def step(state: TrainState, x: jax.Array, y: jax.Array):
        x = jax.lax.with_sharding_constraint(x, batch_s)
        y = jax.lax.with_sharding_constraint(y, batch_s)
        rng, new_rng = jax.random.split(state.rng)
        grads, (terms, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, y, rng, state.step
        )
        return state.apply_gradients(grads, new_bs, new_rng), terms

    return step


def make_sharded_eval_step(
    model: DeblenderVAE, mesh, train_cfg: TrainConfig | None = None
) -> Callable:
    """Jitted weighted validation step (state, x, y, w, rng) -> metrics,
    batch sharded over 'data' (BN in inference mode, sampled latent — same
    semantics as training.train.make_eval_step)."""
    train_cfg = train_cfg or TrainConfig()
    batch_s = mesh_lib.batch_sharding(mesh)

    @jax.jit
    def eval_step(state: TrainState, x, y, w, rng):
        x = jax.lax.with_sharding_constraint(x, batch_s)
        y = jax.lax.with_sharding_constraint(y, batch_s)
        w = jax.lax.with_sharding_constraint(w, batch_s)

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
            weights=w,
        )

    return eval_step


def make_sharded_apply(model: DeblenderVAE, mesh, z_mode: str = "sample") -> Callable:
    """Batch-sharded inference fan-out: (variables, x, rng) -> PixelNormal.

    The deblend batch is split over 'data'; each chip runs the full VAE on
    its shard (weights replicated / TP-sharded), so field-scale batches of
    stamps scale linearly over the slice.
    """
    batch_s = mesh_lib.batch_sharding(mesh)

    @jax.jit
    def apply(variables, x, rng=None):
        from debvader_tpu.utils.flux_cal import apply_flux_calibration

        x = jax.lax.with_sharding_constraint(x, batch_s)
        dist, posterior = model.apply(variables, x, rng=rng, z_mode=z_mode)
        return apply_flux_calibration(dist, variables)

    return apply
