"""Headline benchmark: batched stamp deblending throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); the comparison
anchor is the driver's north-star target of 1e5 stamps/sec/chip
(BASELINE.json), so vs_baseline = stamps_per_sec / 1e5.  Stamps here are the
reference's full 59x59x6 workload (larger than the 45x45x6 north-star stamp),
run through the complete sampled-latent VAE forward (encode -> MVN sample ->
decode -> Normal head) in bfloat16.

Two checkpoint-compatible decoder formulations are measured — the stock
conv_transpose decoder and the output-patch sub-pixel recast
(ModelConfig.decoder_subpixel, docs/DESIGN.md §4) — and the faster one's
number is reported (the recast trades 16/9x FLOPs for up to 4x MXU lane
occupancy at the lane-starved decoder-tail shapes; whether that nets out
positive is a hardware question, so the bench decides empirically).
Per-variant numbers go to stderr; stdout stays one JSON line.

Timing methodology: the device runtime in this environment can acknowledge
``block_until_ready`` before work completes, so we (a) chain iterations
through a data dependency (each forward consumes the previous output) so the
device cannot parallelize or elide them, (b) force completion with a host
fetch of a reduction, and (c) report the differential (N iters - 1 iter)/
(N-1) to cancel dispatch/fetch constants.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 1e5  # stamps/sec/chip, BASELINE.json
BATCH = 4096


def _measure(subpixel: bool) -> float:
    from debvader_tpu.config import ModelConfig
    from debvader_tpu.models.vae import DeblenderVAE, init_vae

    model = DeblenderVAE(
        ModelConfig(dtype="bfloat16", decoder_subpixel=subpixel)
    )
    variables = init_vae(model, jax.random.PRNGKey(0))

    @jax.jit
    def fwd(variables, x, rng):
        dist, _ = model.apply(variables, x, rng=rng)
        return dist.loc

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, 59, 59, 6)), jnp.float32
    )
    rng = jax.random.PRNGKey(1)

    def chain(n_iters: int) -> float:
        t0 = time.perf_counter()
        y = x
        for i in range(n_iters):
            y = fwd(variables, y, jax.random.fold_in(rng, i))
        float(jnp.sum(y))  # host fetch forces real completion
        return time.perf_counter() - t0

    chain(1)  # compile + warm
    chain(5)

    per_iter = []
    for _ in range(3):
        d1, d11 = chain(1), chain(11)
        per_iter.append((d11 - d1) / 10)
    dt = float(np.median(per_iter))
    return BATCH / dt


def main():
    from debvader_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # repeated runs skip the slow first compile

    results = {}
    for name, sub in (("convT", False), ("subpixel", True)):
        results[name] = _measure(sub)
        print(f"{name}: {results[name]:,.0f} stamps/s", file=sys.stderr)

    best = max(results, key=results.get)
    stamps_per_sec = results[best]
    print(
        json.dumps(
            {
                "metric": "deblend_stamps_per_sec_per_chip_59x59x6_bf16",
                "value": round(stamps_per_sec, 1),
                "unit": "stamps/sec",
                "vs_baseline": round(stamps_per_sec / NORTH_STAR, 4),
                "config": f"decoder={best}",
            }
        )
    )


if __name__ == "__main__":
    main()
