"""The shared differential-timing helper (utils/timing.py): the chain
dependency must preserve the production dtype of the feed — a past
per-script copy silently promoted an int32 feed to float32, timing a
different kernel than production ran (and rounding indices >= 2^24)."""

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.utils.timing import (
    chained_seconds_per_iter,
    feed_seconds_per_iter,
    median_seconds_per_iter,
)


def test_feed_timing_preserves_int_dtype_and_values():
    seen = []

    @jax.jit
    def fn(x):
        return x + 1

    feed = jnp.asarray(np.arange(2**24 - 4, 2**24 + 4, dtype=np.int32))

    def spy(x):
        seen.append((x.dtype, np.asarray(x)))
        return fn(x)

    dt = feed_seconds_per_iter(spy, feed, iters=2, warmup_iters=1)
    assert dt == dt  # a real float came back (NaN would fail)
    # every chained input keeps the int32 dtype AND the exact values —
    # a float32 round-trip would round the >= 2^24 entries
    for dtype, vals in seen:
        assert dtype == jnp.int32
        np.testing.assert_array_equal(vals, np.asarray(feed))


def test_feed_timing_float_perturbation_is_tiny():
    seen = []

    @jax.jit
    def fn(x):
        return 2.0 * x

    feed = jnp.ones((8,), jnp.float32)

    def spy(x):
        seen.append(np.asarray(x))
        return fn(x)

    feed_seconds_per_iter(spy, feed, iters=2, warmup_iters=1)
    for vals in seen:
        np.testing.assert_allclose(vals, 1.0, atol=1e-9)


def test_feed_timing_half_precision_chain_survives():
    # 1e-12 flushes to exactly 0 in float16; the old direct-dtype
    # perturbation severed the chain (0*eps folds away).  The float32
    # round-trip path must keep the dependency real AND the values intact.
    seen = []

    @jax.jit
    def fn(x):
        return x * jnp.float16(2.0)

    feed = jnp.ones((8,), jnp.float16)

    def spy(x):
        seen.append((x.dtype, np.asarray(x, np.float32)))
        return fn(x)

    dt = feed_seconds_per_iter(spy, feed, iters=2, warmup_iters=1)
    assert dt == dt
    for dtype, vals in seen:
        assert dtype == jnp.float16
        np.testing.assert_allclose(vals, 1.0, atol=1e-3)


def test_chained_and_median_run_step_counts():
    calls = []

    def step(prev):
        calls.append(prev is None)
        base = jnp.zeros((4,)) if prev is None else prev
        return base + 1

    dt = chained_seconds_per_iter(step, iters=3, warmup_iters=2)
    # chains: compile(1) + warm(2) + diff(1) + diff(4) = 8 step calls,
    # 4 of them chain starts
    assert len(calls) == 8 and sum(calls) == 4
    assert isinstance(dt, float)

    calls.clear()
    dt = median_seconds_per_iter(step, iters=2, warmup_iters=1, reps=2)
    # compile(1) + warm(1) + 2 reps x (1 + 3) = 10 calls, 6 chain starts
    assert len(calls) == 10 and sum(calls) == 6
    assert isinstance(dt, float)
