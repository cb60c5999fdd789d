"""Stamp-level deblending: the batched VAE forward.

Reference: ``deblend(net, images, normalise)`` at
deblend_cutout/deblender.py:6-25 — one batched forward returning
(mean images, output distribution).  Here the normalize -> encode -> sample
-> decode -> denormalize chain is a single jitted XLA program, compiled once
per batch-size bucket; bf16 compute is a config switch.

The reference's ``normalise=True`` path is broken (it denormalizes a
*sample*, destroying the distribution — SURVEY.md §2 row 12); we implement
the mathematically intended behavior: denormalize the distribution via the
delta method (ops/normalize.py) and document the divergence.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.models.distributions import PixelNormal
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.ops.normalize import denormalize_distribution, normalize_non_linear

__all__ = [
    "deblend",
    "deblend_jit",
    "deblend_samples",
    "deblend_sample_stats",
    "padded_forward",
]

_PADDED_BATCH_BUCKETS = (1, 8, 32, 128, 512, 2048, 8192)


def _bucket(n: int) -> int:
    for b in _PADDED_BATCH_BUCKETS:
        if n <= b:
            return b
    return n


@partial(jax.jit, static_argnames=("model", "normalise", "z_mode"))
def deblend_jit(
    model: DeblenderVAE,
    variables: Any,
    images: jax.Array,
    rng: jax.Array,
    normalise: bool = False,
    z_mode: str = "sample",
) -> PixelNormal:
    """Fully-fused deblend forward; images (N, S, S, B) float32.

    Non-finite pixels (chip gaps, saturation) enter the network as 0 —
    background level for sky-subtracted stamps — instead of propagating
    NaN through every conv into the outputs."""
    from debvader_tpu.utils.flux_cal import apply_flux_calibration

    x = images.astype(jnp.float32)
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    if normalise:
        x = normalize_non_linear(x)
    dist, _ = model.apply(variables, x, rng=rng, z_mode=z_mode)
    # Fidelity-mode photometric correction (utils/flux_cal.py) — a no-op
    # unless the variables carry a flux_cal collection.  Applied in network
    # space, before any denormalization.
    dist = apply_flux_calibration(dist, variables)
    if normalise:
        dist = denormalize_distribution(dist)
    return dist


def padded_forward(fwd, images, rng) -> PixelNormal:
    """Run an ``(images, rng) -> (loc, scale)`` forward (e.g. a
    make_quantized_forward closure) with the same batch-bucket padding as
    :func:`deblend`, so repeated calls reuse one compiled program.

    ``fwd`` owns the finite guard and any normalize/denormalize bracket
    (make_quantized_forward bakes them in); this helper only pads, calls,
    and un-pads."""
    x = jnp.asarray(images, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    n = x.shape[0]
    m = _bucket(n)
    if m != n:
        x = jnp.concatenate([x, jnp.zeros((m - n,) + x.shape[1:], x.dtype)])
    loc, scale = fwd(x, rng)
    return PixelNormal(loc[:n], scale[:n])


def deblend(
    net: tuple[DeblenderVAE, Any],
    images,
    normalise: bool = False,
    rng: jax.Array | None = None,
    z_mode: str = "sample",
    pad_to_bucket: bool = True,
    fetch_mean: bool = True,
):
    """Drop-in equivalent of the reference deblend().

    parameters:
        net: (model, variables) as returned by load_deblender / training
        images: (N, S, S, B) array; a single image may be passed as (S, S, B)
        normalise: apply tanh(arcsinh) in, exact-inverse out (fixed-math path)
        rng: PRNG key for the sampled latent (defaults to key 0); pass fresh
            keys to draw independent epistemic samples
        z_mode: 'sample' (reference behavior) or 'mean' (deterministic)
        pad_to_bucket: round the batch up to a fixed bucket so repeated calls
            reuse one compiled program instead of recompiling per batch size
        fetch_mean: download the mean images to host (reference contract);
            False returns (None, dist) and leaves everything on device so
            callers batching several fetches avoid an extra full transfer

    returns (mean_images, distribution) like the reference
    (deblend_cutout/deblender.py:24).
    """
    model, variables = net
    x = jnp.asarray(images, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    n = x.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    m = _bucket(n) if pad_to_bucket else n
    if m != n:
        x = jnp.concatenate([x, jnp.zeros((m - n,) + x.shape[1:], x.dtype)])
    dist = deblend_jit(model, variables, x, rng, normalise=normalise, z_mode=z_mode)
    if m != n:
        dist = PixelNormal(dist.loc[:n], dist.scale[:n])
    return (np.asarray(dist.mean()) if fetch_mean else None), dist


def deblend_samples(
    net: tuple[DeblenderVAE, Any],
    images,
    n_samples: int,
    rng: jax.Array | None = None,
    normalise: bool = False,
    max_chunk: int = 8192,
    mesh=None,
    apply_fn=None,
) -> jax.Array:
    """Epistemic sampling: n_samples independent forwards per image
    (replaces the reference's 100-forwards-per-source Python loop,
    field_deblender.py:303-316).  Returns (n_samples, N, S, S, B) means.

    The stochastic part of the forward is the latent draw — the encoder is
    deterministic (BatchNorm in inference mode), so re-running it per
    replica, as the reference's net(x)-in-a-loop does, recomputes the
    identical posterior 100 times.  Here each source encodes ONCE; the
    (sample, source) pairs then flatten into MXU-sized chunks of latent
    draws + decodes.  Bit-for-bit the same distribution of outputs as
    re-encoding (the posterior is a pure function of x), at roughly the
    decoder's share of the forward cost.

    With ``mesh`` (and optionally a cached ``apply_fn`` from
    ``make_sharded_apply``) the flattened (sample, source) batch is sharded
    over the mesh's 'data' axis through the full forward instead (the
    encode-once split is a single-chip optimization).
    """
    model, variables = net
    x = jnp.asarray(images, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    n = x.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    draw = _make_replica_draw(
        model, variables, x, rng, normalise, mesh, apply_fn
    )
    reps_per_chunk = max(max_chunk // max(n, 1), 1)
    outs = []
    done = 0
    i = 0
    while done < n_samples:
        reps = min(reps_per_chunk, n_samples - done)
        outs.append(draw(reps, i))
        done += reps
        i += 1
    return jnp.concatenate(outs, axis=0)


def _make_replica_draw(model, variables, x, rng, normalise, mesh, apply_fn):
    """draw(reps, i) -> (reps, N, S, S, B) sampled means — the one place
    that picks between the single-chip encode-once path and the
    mesh-sharded full forward (deblend_samples and deblend_sample_stats
    both chunk through it).  ``apply_fn`` without a mesh falls back to the
    single-chip path."""
    n = x.shape[0]
    if mesh is not None and apply_fn is None:
        from debvader_tpu.parallel.sharded import make_sharded_apply

        apply_fn = make_sharded_apply(model, mesh)

    if mesh is not None:
        from debvader_tpu.parallel.sharded import sharded_forward

        def draw(reps, i):
            xx = jnp.tile(x, (reps, 1, 1, 1))
            loc = sharded_forward(
                apply_fn, variables, xx, jax.random.fold_in(rng, i), mesh,
                normalise=normalise,
            ).loc
            return loc.reshape((reps, n) + x.shape[1:])

        return draw

    loc, tril = _encode_jit(model, variables, x, normalise)

    def draw(reps, i):
        return _sample_decode_jit(
            model, variables, loc, tril, jax.random.fold_in(rng, i), reps,
            normalise,
        )

    return draw


def deblend_sample_stats(
    net: tuple[DeblenderVAE, Any],
    images,
    n_samples: int,
    rng: jax.Array | None = None,
    normalise: bool = False,
    max_chunk: int = 8192,
    mesh=None,
    apply_fn=None,
):
    """(mean, std) over ``n_samples`` stochastic forwards per image,
    accumulated ON DEVICE — the epistemic statistics without materializing
    the (n_samples, N, S, S, B) sample cube ``deblend_samples`` returns
    (100 samples x a survey chunk of 8k sources is ~70 GB; the statistics
    are 2 x N stamps).

    Replica chunks stream through the forward and merge into running
    Welford statistics (parallel-variance merge, numerically stable for
    singleton chunks), so peak memory is one replica chunk + two stamp
    maps.  Same sampling distribution as deblend_samples (encode-once on a
    single chip, full sharded forwards on a mesh).
    """
    model, variables = net
    x = jnp.asarray(images, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    n = x.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    draw = _make_replica_draw(
        model, variables, x, rng, normalise, mesh, apply_fn
    )
    reps_per_chunk = max(max_chunk // max(n, 1), 1)
    count = 0
    mean = None
    m2 = None
    done = 0
    i = 0
    while done < n_samples:
        reps = min(reps_per_chunk, n_samples - done)
        samples = draw(reps, i)
        c_mean = jnp.mean(samples, axis=0)
        c_m2 = jnp.sum(jnp.square(samples - c_mean[None]), axis=0)
        if mean is None:
            mean, m2, count = c_mean, c_m2, reps
        else:
            mean, m2 = _welford_merge_jit(
                mean, m2, jnp.float32(count), c_mean, c_m2, jnp.float32(reps)
            )
            count += reps
        done += reps
        i += 1
    std = jnp.sqrt(jnp.maximum(m2 / count, 0.0))
    return mean, std


@jax.jit
def _welford_merge_jit(mean, m2, count, c_mean, c_m2, c_count):
    """Parallel-variance merge of (mean, M2, count) with a chunk's stats."""
    total = count + c_count
    delta = c_mean - mean
    new_mean = mean + delta * (c_count / total)
    new_m2 = m2 + c_m2 + jnp.square(delta) * (count * c_count / total)
    return new_mean, new_m2


@partial(jax.jit, static_argnames=("model", "normalise"))
def _encode_jit(model, variables, x, normalise):
    """One deterministic encode: x (N, S, S, B) -> posterior (loc, tril)."""
    x = jnp.where(jnp.isfinite(x), x, 0.0)  # same guard as deblend_jit
    if normalise:
        x = normalize_non_linear(x)
    posterior = model.apply(variables, x, method=lambda m, x: m.encode(x))
    return posterior.loc, posterior.scale_tril


@partial(jax.jit, static_argnames=("model", "reps", "normalise"))
def _sample_decode_jit(model, variables, loc, tril, rng, reps, normalise):
    """reps independent latent draws per source + batched decode:
    -> (reps, N, S, S, B) means."""
    from debvader_tpu.models.distributions import MultivariateNormalTriL

    n = loc.shape[0]
    posterior = MultivariateNormalTriL(
        jnp.tile(loc, (reps, 1)), jnp.tile(tril, (reps, 1, 1))
    )
    z = posterior.sample(rng)
    dist = model.apply(variables, z, method=lambda m, z: m.decode(z))
    from debvader_tpu.utils.flux_cal import apply_flux_calibration

    dist = apply_flux_calibration(dist, variables)
    if normalise:
        dist = denormalize_distribution(dist)
    return dist.loc.reshape((reps, n) + dist.loc.shape[1:])
