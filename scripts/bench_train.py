"""Training-throughput benchmark: ELBO train stamps/sec on one chip.

Produced the BASELINE.md training rows.  Methodology: the state IS a data-
dependency chain (step N consumes step N-1's state), so a window of steps
bounded by loss fetches cannot be elided or reordered; we fetch the loss
before starting the timer (draining all queued work) and close each window
with another fetch.  The closing fetch rides this environment's host
tunnel, whose ~1 s latency noise would swamp a short window, so the
reported number is the differential between a 450- and a 50-step window
(median of 3), which cancels the fetch constant.

Usage: python scripts/bench_train.py [batch] [dtype ...]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from debvader_tpu.config import ModelConfig, TrainConfig
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.training.train import create_train_state, make_train_step
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def measure(dtype: str, batch: int) -> float:
    model = DeblenderVAE(ModelConfig(dtype=dtype))
    cfg = TrainConfig(batch_size=batch, seed=0)
    step = make_train_step(model, cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 59, 59, 6)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(batch, 59, 59, 6)), jnp.float32)

    state = create_train_state(model, cfg)
    terms = None
    for _ in range(5):  # compile + warm
        state, terms = step(state, x, y)
    float(terms["loss"])  # drain

    def window(n: int) -> float:
        nonlocal state, terms
        t0 = time.perf_counter()
        for _ in range(n):
            state, terms = step(state, x, y)
        float(terms["loss"])  # closes the window: the state chain is strict
        return time.perf_counter() - t0

    per_step = []
    for _ in range(3):
        t_small, t_big = window(50), window(450)
        per_step.append((t_big - t_small) / 400)
    dt = float(np.median(per_step))
    return batch / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtypes = sys.argv[2:] or ["float32", "bfloat16"]
    print(f"backend={jax.default_backend()} batch={batch}", flush=True)
    for dt in dtypes:
        sps = measure(dt, batch)
        print(f"{dt}: {sps:,.0f} train stamps/sec ({sps / batch:.1f} steps/sec)", flush=True)


if __name__ == "__main__":
    main()
