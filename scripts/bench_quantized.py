"""End-to-end serving benchmark: bf16 forward vs int8-quantized forward.

Runs the full sampled deblend forward (encode -> MVN sample -> decode ->
Normal head) at the production serving batch, bf16 params/compute vs the
PTQ int8 path (models/quantized.py), and reports stamps/sec for both plus
the accuracy deltas on the same inputs.  Differential chained timing as in
bench.py (this environment's runtime acks block_until_ready early).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.models import quantized as q
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = 4096


def chain_time(fwd, x, rng, iters=12):
    import itertools

    from debvader_tpu.utils.timing import chained_seconds_per_iter

    draws = itertools.count()

    def step(prev):
        xx = x if prev is None else x + prev[0] * jnp.zeros((), x.dtype)
        return fwd(xx, jax.random.fold_in(rng, next(draws)))

    return chained_seconds_per_iter(step, iters=iters)


def main():
    print(f"backend={jax.default_backend()} batch={BATCH}", flush=True)
    # Shipped trained weights + representative simulated stamps: random-init
    # weights under random-normal inputs produce near-zero total fluxes, so
    # relative-flux accuracy on them is dominated by the tiny denominator
    # and says nothing about the quantization error on real deblending.
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.training.checkpoint import load_deblender

    model, variables = load_deblender("sim_demo", dtype="bfloat16")
    rng = jax.random.PRNGKey(1)
    stamps, _, _ = simulate_batch(jax.random.PRNGKey(2), 512)
    x = jnp.tile(jnp.asarray(stamps, jnp.float32), (BATCH // 512, 1, 1, 1))

    @jax.jit
    def fwd_bf16(images, rng):
        dist, _ = model.apply(variables, images, rng=rng)
        return dist.loc, dist.scale

    qv = q.quantize_vae(model, variables, x[:256], rng=rng)
    fwd_int8 = q.make_quantized_forward(qv)

    tb = chain_time(fwd_bf16, x, rng)
    ti = chain_time(fwd_int8, x, rng)
    print(
        f"bf16 forward: {tb * 1e3:7.2f} ms/batch  {BATCH / tb:9.0f} stamps/s",
        flush=True,
    )
    print(
        f"int8 forward: {ti * 1e3:7.2f} ms/batch  {BATCH / ti:9.0f} stamps/s  "
        f"speedup {tb / ti:4.2f}x",
        flush=True,
    )

    # accuracy on a disjoint simulated batch, deterministic mean forward
    test, _, _ = simulate_batch(jax.random.PRNGKey(7), 256)
    test = jnp.asarray(test, jnp.float32)
    db, _ = q.quantized_forward(qv, test, z_mode="mean", quant=False)
    dq, _ = q.quantized_forward(qv, test, z_mode="mean", quant=True)
    lb = np.asarray(db.loc, np.float64)
    lq = np.asarray(dq.loc, np.float64)
    tot_b, tot_q = lb.sum(axis=(1, 2, 3)), lq.sum(axis=(1, 2, 3))
    rel = np.abs(tot_q - tot_b) / np.maximum(np.abs(tot_b), 1e-9)
    rmse = np.sqrt(((lq - lb) ** 2).mean()) / max(np.sqrt((lb**2).mean()), 1e-30)
    print(
        f"accuracy (vs this bf16 float path): flux rel err mean "
        f"{rel.mean():.5f} max {rel.max():.5f}, pixel RMSE ratio {rmse:.5f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
