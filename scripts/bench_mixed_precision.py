"""Mixed-precision serving ladder: bf16 body + fp32 decoder tail.

The bf16 forward's flux error lives almost entirely in the decoder's late
stages (attribution in BASELINE.md round 3): enc16+dec32 measures ~1e-6
where enc16+dec16 measures ~1e-4-5e-4.  ModelConfig.decoder_f32_stages
runs the last N ConvTranspose pairs (+ the final band conv) in float32 —
this script measures, per N, the throughput cost and the flux error vs the
full-fp32 forward, to find the cheapest N that clears the <=1e-4 fidelity
clause on this hardware.

CAVEAT (superseded measurement): this script's fidelity baseline is the
on-TPU fp32 forward, which at jax.lax.Precision.DEFAULT itself rounds
every matmul input to bfloat16 (measured 6.7e-3 max flux err vs true
fp32).  scripts/bench_precision.py measures the real ladder against a
CPU true-fp32 reference; the <=1e-4 serving mode is
ModelConfig(matmul_precision='highest').

Usage: python scripts/bench_mixed_precision.py [batch]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.config import ModelConfig
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def chain_time(fwd, x, rng, iters=10):
    from debvader_tpu.utils.timing import median_seconds_per_iter

    draws = itertools.count()

    def step(prev):
        y = x if prev is None else prev
        return fwd(y, jax.random.fold_in(rng, next(draws)))

    return median_seconds_per_iter(step, iters=iters, warmup_iters=5, reps=5)


def main():
    print(f"backend={jax.default_backend()} batch={BATCH}", flush=True)
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.training.checkpoint import load_deblender

    _, variables = load_deblender("sim_demo")
    rng = jax.random.PRNGKey(1)
    stamps, _, _ = simulate_batch(jax.random.PRNGKey(2), 512)
    x = jnp.tile(
        jnp.asarray(stamps, jnp.float32), (max(BATCH // 512, 1), 1, 1, 1)
    )
    test, _, _ = simulate_batch(jax.random.PRNGKey(7), 256)
    test = jnp.asarray(test, jnp.float32)

    def build(dtype, n):
        model = DeblenderVAE(ModelConfig(dtype=dtype, decoder_f32_stages=n))

        @jax.jit
        def fwd(images, rng):
            dist, _ = model.apply(variables, images, rng=rng)
            return dist.loc

        @jax.jit
        def fwd_mean(images):
            dist, _ = model.apply(variables, images, z_mode="mean")
            return dist.loc

        return fwd, fwd_mean

    _, ref_mean = build("float32", 0)
    ref = np.asarray(ref_mean(test), np.float64)

    rows = [("fp32", "float32", 0)] + [
        (f"bf16 f32_stages={n}", "bfloat16", n) for n in (0, 1, 2)
    ]
    for name, dtype, n in rows:
        fwd, fwd_mean = build(dtype, n)
        loc = np.asarray(fwd_mean(test), np.float64)
        tot, tr = loc.sum(axis=(1, 2, 3)), ref.sum(axis=(1, 2, 3))
        rel = np.abs(tot - tr) / np.maximum(np.abs(tr), 1e-9)
        dt = chain_time(fwd, x, rng)
        print(
            f"{name:>20}: {dt * 1e3:7.2f} ms/batch {BATCH / dt:9.0f} stamps/s"
            f"  flux err vs fp32 mean {rel.mean():.2e} max {rel.max():.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
