"""MXU precision ladder for the float32 serving forward.

On TPU, jax.lax.Precision.DEFAULT rounds every float32 matmul/conv input
to bfloat16 (one MXU pass, fp32 accumulation) — so a dtype='float32'
model at the default precision is NOT doing fp32 math, and a fidelity
measurement that uses the on-TPU fp32 forward as its own reference
(scripts/bench_mixed_precision.py) cannot see that truncation.

This script measures the real ladder against a CPU float32 forward
(exact fp32 math, the stand-in for the reference's Keras fp32 output,
/root/reference/src/debvader/model/model.py:221-266):

    fp32 + HIGHEST (6-pass)  |  fp32 + HIGH (3-pass)  |  fp32 + DEFAULT
    (1-pass)  |  bfloat16 compute

reporting per-stamp total-flux relative error (the DC2 <=1e-4 clause's
metric) and chained-timing throughput for each.

Usage: python scripts/bench_precision.py [batch] [row-name-filter]
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
    # Ceil-tile then slice so the timed batch is exactly BATCH rows (the
    # printed stamps/s divides by BATCH).
    reps_needed = -(-BATCH // 512)
    x = jnp.tile(jnp.asarray(stamps, jnp.float32), (reps_needed, 1, 1, 1))[:BATCH]
    test_np = np.asarray(simulate_batch(jax.random.PRNGKey(7), 256)[0], np.float32)

    def build(dtype, precision, layer_precision=None, flux_cal=False):
        model = DeblenderVAE(
            ModelConfig(
                dtype=dtype,
                matmul_precision=precision,
                layer_precision=layer_precision,
            )
        )
        use_vars = variables
        if flux_cal:
            from debvader_tpu.utils.flux_cal import (
                apply_flux_calibration,
                attach_flux_calibration,
            )

            use_vars = attach_flux_calibration(model, variables)

        def _apply(images, rng=None, z_mode="sample"):
            dist, _ = model.apply(
                {k: use_vars[k] for k in ("params", "batch_stats")},
                images, rng=rng, z_mode=z_mode,
            )
            if flux_cal:
                dist = apply_flux_calibration(dist, use_vars)
            return dist.loc

        fwd = jax.jit(lambda images, rng: _apply(images, rng))
        fwd_mean = jax.jit(lambda images: _apply(images, z_mode="mean"))
        return fwd, fwd_mean

    # Ground truth: exact fp32 math on the CPU backend.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = DeblenderVAE(ModelConfig())
        cpu_vars = jax.device_put(
            jax.tree_util.tree_map(np.asarray, variables), cpu
        )
        ref = np.asarray(
            jax.jit(
                lambda v, im: model.apply(v, im, z_mode="mean")[0].loc
            )(cpu_vars, jax.device_put(test_np, cpu)),
            np.float64,
        )
    tr = ref.sum(axis=(1, 2, 3))

    ALL_KEYS = (
        [f"enc/Conv_{i}" for i in range(8)]
        + ["enc/Dense_0", "dec/Dense_0", "dec/Dense_1"]
        + [f"dec/ConvT_{i}" for i in range(8)]
        + ["dec/Conv_0"]
    )
    rows = [
        ("fp32 highest", "float32", "highest", None),
        ("fp32 high", "float32", "high", None),
        # HIGH + per-band photometric calibration of its truncation bias
        # (utils/flux_cal.py) — the round-4 fidelity serving mode
        ("fp32 high+cal", "float32", "high", None, True),
        ("fp32 default", "float32", None, None),
        ("bf16", "bfloat16", None, None),
    ]
    # Explicit bf16-limb schemes (models/precision.py): RNE limb splits with
    # output-channel lane packing — better error per pass than the native
    # rungs, and cheaper than pass count at the lane-starved decoder tail.
    for scheme in ("bf16x3", "bf16x4", "bf16x5", "bf16x6", "bf16x9"):
        rows.append(
            (f"mp {scheme}", "float32", None, {k: scheme for k in ALL_KEYS})
        )
    # The searched placement (results/precision_placement.json), if present.
    placement_path = (
        Path(__file__).resolve().parent.parent
        / "results"
        / "precision_placement.json"
    )
    if placement_path.exists():
        import json

        placement = json.loads(placement_path.read_text())["placement"]
        rows.append(("mp searched", "float32", None, placement))
    row_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    test = jnp.asarray(test_np)
    for row in rows:
        name, dtype, precision, layer_precision = row[:4]
        flux_cal = bool(row[4]) if len(row) > 4 else False
        if row_filter and row_filter not in name:
            continue
        fwd, fwd_mean = build(dtype, precision, layer_precision, flux_cal)
        loc = np.asarray(fwd_mean(test), np.float64)
        tot = loc.sum(axis=(1, 2, 3))
        rel = np.abs(tot - tr) / np.maximum(np.abs(tr), 1e-9)
        px = np.sqrt(((loc - ref) ** 2).mean()) / max(np.sqrt((ref**2).mean()), 1e-12)
        dt = chain_time(fwd, x, rng)
        print(
            f"{name:>14}: {dt * 1e3:7.2f} ms/batch {BATCH / dt:9.0f} stamps/s"
            f"  flux err vs CPU-fp32 mean {rel.mean():.2e} max {rel.max():.2e}"
            f"  pixel rmse ratio {px:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
