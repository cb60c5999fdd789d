"""Batch-size sweep for the 59x59x6 headline lines (bf16 + fidelity).

The 45x45 fidelity sweep found batch ~1536 measurably faster than 4096
(scripts/bench_fidelity45.py: 99.2k -> 102.7-104.6k); check whether the
59-stamp lines leave similar throughput on the table at the historical
batch 4096.  Writes results/batch_sweep59.json.
"""

import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.config import (
    FIDELITY_NEEDS_FLUX_CAL,
    ModelConfig,
    fidelity_serving_config,
)
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.utils.compile_cache import enable_compilation_cache
from debvader_tpu.utils.timing import median_seconds_per_iter

enable_compilation_cache()

OUT = Path(__file__).resolve().parent.parent / "results" / "batch_sweep59.json"
RESULTS = {}


def measure(cfg, batch, flux_cal):
    model = DeblenderVAE(cfg)
    variables = init_vae(model, jax.random.PRNGKey(0))
    if flux_cal:
        from debvader_tpu.utils.flux_cal import attach_flux_calibration

        variables = attach_flux_calibration(model, variables)

    @jax.jit
    def fwd(variables, x, rng):
        dist, _ = model.apply(variables, x, rng=rng)
        return dist.loc

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 59, 59, 6)), jnp.float32
    )
    rng = jax.random.PRNGKey(1)
    draws = itertools.count()

    def step(prev):
        y = x if prev is None else prev
        return fwd(variables, y, jax.random.fold_in(rng, next(draws)))

    dt = median_seconds_per_iter(step, iters=10, warmup_iters=4, reps=5)
    return batch / dt


def main():
    if OUT.exists():
        RESULTS.update(json.loads(OUT.read_text()))
    fid = fidelity_serving_config()
    bf16 = ModelConfig(dtype="bfloat16")
    batches = (
        tuple(int(b) for b in sys.argv[1].split(","))
        if len(sys.argv) > 1
        else (1536, 2048, 4096)
    )
    for batch in batches:
        for name, cfg, cal in (
            ("fid", fid, FIDELITY_NEEDS_FLUX_CAL),
            ("bf16", bf16, False),
        ):
            key = f"{name}_b{batch}"
            rate = measure(cfg, batch, cal)
            RESULTS[key] = round(rate, 1)
            OUT.write_text(json.dumps(RESULTS, indent=1))
            print(f"{key}: {rate:,.0f} stamps/s", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
