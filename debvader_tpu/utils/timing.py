"""Differential data-dependency-chained wall timing.

This environment's runtime acks ``block_until_ready`` before device work
completes, so naive timing under-measures.  The methodology every
benchmark here shares (bench.py and the scripts/ measurement suite):

1. build a CHAIN of N iterations where each step derives its input from
   the previous step's output — XLA can then neither elide repeated runs
   nor overlap them;
2. end the chain with a host fetch of a reduction (the one sync that is
   honest in this environment);
3. report the DIFFERENTIAL (chain(iters+1) - chain(1)) / iters, which
   cancels the per-chain fixed costs (dispatch ramp, the fetch itself).

Keeping the implementation in one place keeps its semantics — and its
bugs — in one place: a past copy of this helper silently promoted an
int32 feed to float32 through its perturbation expression, timing a
different kernel than production ran (see scripts/sweep_label_steps.py).
Step closures must preserve the production dtype of whatever they feed
back; an integer feed wants a value-preserving dependency like
``feed | (out_scalar & 0)``, a float feed ``feed + 1e-12 * out_scalar``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = [
    "chained_seconds_per_iter",
    "median_seconds_per_iter",
    "feed_seconds_per_iter",
]


def _default_fetch(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def _differential_samples(step, *, iters, warmup_iters, reps, fetch):
    """Shared compile/warm/chain core: one compile chain, one warm chain,
    then ``reps`` differential measurements of ``step``.  Both public
    variants go through here so the methodology (and its bugs) stays in
    one place."""
    fetch = fetch or _default_fetch

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = step(out)
        fetch(out)
        return time.perf_counter() - t0

    chain(1)  # compile
    chain(warmup_iters)  # warm
    samples = []
    for _ in range(reps):
        d1 = chain(1)
        dn = chain(iters + 1)
        samples.append((dn - d1) / iters)
    return samples


def chained_seconds_per_iter(step, *, iters=5, warmup_iters=2, fetch=None):
    """Seconds per iteration of ``step``, differentially measured.

    ``step(prev)``: run one iteration and return its output; ``prev`` is
    ``None`` on the first call of each chain, else the previous output —
    the step MUST derive its device input from ``prev`` (dtype-preserving;
    see module docstring) so the chain is a real data dependency.
    ``fetch(out)``: host-sync the final output; default fetches
    ``float(jnp.sum(first_leaf))``.
    """
    return _differential_samples(
        step, iters=iters, warmup_iters=warmup_iters, reps=1, fetch=fetch
    )[0]


def feed_seconds_per_iter(fn, feed, *, iters=5, warmup_iters=2, fetch=None):
    """Time ``fn(feed)`` where the chain dependency is a value- and
    dtype-preserving perturbation of ``feed`` by one element of the
    previous output: integer feeds get ``feed | (eps & 0)`` (exact),
    float feeds ``feed + 1e-12 * eps``.  This is the common case for the
    kernel microbenchmarks (a fixed input re-fed every iteration)."""
    feed = jnp.asarray(feed)
    integer = jnp.issubdtype(feed.dtype, jnp.integer)

    def step(prev):
        if prev is None:
            return fn(feed)
        eps = jnp.ravel(jax.tree_util.tree_leaves(prev)[0])[:1]
        if integer:
            x = feed | (eps.astype(feed.dtype) & 0)
        elif jnp.finfo(feed.dtype).bits < 32:
            # 1e-12 flushes to exactly 0 in float16 (min subnormal ~6e-8),
            # which would sever the chain (0*eps constant-folds away) or
            # NaN-poison it (0*inf).  Perturb in float32 and round back:
            # 1e-12*eps is far below half an fp16/bf16 ulp, so the value
            # is preserved while the data dependency is real.
            x = (
                feed.astype(jnp.float32)
                + jnp.float32(1e-12) * eps.astype(jnp.float32)
            ).astype(feed.dtype)
        else:
            x = feed + jnp.asarray(1e-12, feed.dtype) * eps.astype(feed.dtype)
        return fn(x)

    return chained_seconds_per_iter(
        step, iters=iters, warmup_iters=warmup_iters, fetch=fetch
    )


def median_seconds_per_iter(step, *, iters=5, warmup_iters=2, reps=3, fetch=None):
    """Median of ``reps`` differential measurements (one shared
    compile/warm pass) — the headline-number variant (bench.py): medians
    damp this environment's tunnel-window drift between chains."""
    import numpy as np

    return float(
        np.median(
            _differential_samples(
                step, iters=iters, warmup_iters=warmup_iters, reps=reps, fetch=fetch
            )
        )
    )
