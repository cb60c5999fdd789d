"""Selective-PTQ ablation: which layers buy int8 speed, which buy error.

docs/DESIGN.md §4's roofline says the int8 win lives in the peak-bound
>=128-channel stages (enc Conv_4..7, dec ConvT_0..3, the two big Denses);
the lane-bound decoder tail (ConvT_4..7, 32-64 channels at 68-74 TF/s)
gains nothing from the 2x int8 MXU rate.  Error-wise the suspects are the
opposite end: the tail sits closest to the output, and enc/Dense_0 emits
the latent-posterior parameters every decoder FLOP amplifies.  This sweep
measures both sides per subset so the production `quantize_vae(layers=...)`
choice is a table lookup, not a guess.

Fidelity is reported against the float32 forward (the reference truth per
BASELINE.json's <=1e-4 rel-flux clause) with the bf16 float path's own
error as the context bar: a quantized variant whose error is comparable to
bf16's is "free" relative to the bf16 serving default.

Usage: python scripts/ablate_quantized.py [batch]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.models import quantized as q
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

ENC_BIG = [f"enc/Conv_{i}" for i in (4, 5, 6, 7)]
ENC_SMALL = [f"enc/Conv_{i}" for i in (0, 1, 2, 3)]
DEC_BIG = [f"dec/ConvTranspose2DTF_{i}" for i in (0, 1, 2, 3)]
DEC_TAIL = [f"dec/ConvTranspose2DTF_{i}" for i in (4, 5, 6, 7)]
DENSES = ["enc/Dense_0", "dec/Dense_1"]

SUBSETS = {
    "all": ENC_SMALL + ENC_BIG + DEC_BIG + DEC_TAIL + DENSES,
    "no_tail": ENC_SMALL + ENC_BIG + DEC_BIG + DENSES,
    "big+denses": ENC_BIG + DEC_BIG + DENSES,
    "big+decdense": ENC_BIG + DEC_BIG + ["dec/Dense_1"],
    "big_only": ENC_BIG + DEC_BIG,
    "tail_only": DEC_TAIL,  # error attribution control
}


def chain_time(fwd, x, rng, iters=12):
    from debvader_tpu.utils.timing import chained_seconds_per_iter

    draws = itertools.count()

    def step(prev):
        xx = x if prev is None else x + prev[0] * jnp.zeros((), x.dtype)
        return fwd(xx, jax.random.fold_in(rng, next(draws)))

    return chained_seconds_per_iter(step, iters=iters)


def flux_err(loc, ref):
    loc = np.asarray(loc, np.float64)
    tot, tot_r = loc.sum(axis=(1, 2, 3)), ref.sum(axis=(1, 2, 3))
    rel = np.abs(tot - tot_r) / np.maximum(np.abs(tot_r), 1e-9)
    rmse = np.sqrt(((loc - ref) ** 2).mean()) / max(
        np.sqrt((ref**2).mean()), 1e-30
    )
    return rel.mean(), rel.max(), rmse


def main():
    print(f"backend={jax.default_backend()} batch={BATCH}", flush=True)
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.training.checkpoint import load_deblender

    model, variables = load_deblender("sim_demo", dtype="bfloat16")
    model32, variables32 = load_deblender("sim_demo", dtype="float32")
    rng = jax.random.PRNGKey(1)
    stamps, _, _ = simulate_batch(jax.random.PRNGKey(2), 512)
    x = jnp.tile(jnp.asarray(stamps, jnp.float32), (max(BATCH // 512, 1), 1, 1, 1))

    # ---- fidelity references (deterministic z=mean forward, disjoint batch)
    test, _, _ = simulate_batch(jax.random.PRNGKey(7), 256)
    test = jnp.asarray(test, jnp.float32)
    qv32 = q.quantize_vae(model32, variables32, x[:256], rng=rng)
    ref32, _ = q.quantized_forward(qv32, test, z_mode="mean", quant=False)
    ref32 = np.asarray(ref32.loc, np.float64)

    qv_all = q.quantize_vae(model, variables, x[:256], rng=rng)
    bf16, _ = q.quantized_forward(qv_all, test, z_mode="mean", quant=False)
    m, mx, r = flux_err(bf16.loc, ref32)
    print(
        f"{'bf16-float':>13}: flux rel err vs fp32 mean {m:.2e} max {mx:.2e} "
        f"rmse {r:.2e}  <- context bar",
        flush=True,
    )

    @jax.jit
    def fwd_bf16(images, rng):
        dist, _ = model.apply(variables, images, rng=rng)
        return dist.loc, dist.scale

    tb = chain_time(fwd_bf16, x, rng)
    print(
        f"{'bf16-float':>13}: {tb * 1e3:7.2f} ms/batch "
        f"{BATCH / tb:9.0f} stamps/s (speed baseline)",
        flush=True,
    )

    for name, layers in SUBSETS.items():
        qv = q.quantize_vae(model, variables, x[:256], rng=rng, layers=layers)
        dq, _ = q.quantized_forward(qv, test, z_mode="mean", quant=True)
        m, mx, r = flux_err(dq.loc, ref32)
        ti = chain_time(q.make_quantized_forward(qv), x, rng)
        print(
            f"{name:>13}: {ti * 1e3:7.2f} ms/batch {BATCH / ti:9.0f} stamps/s "
            f"({tb / ti:4.2f}x)  flux err vs fp32 mean {m:.2e} max {mx:.2e} "
            f"rmse {r:.2e}  [{len(layers)} layers]",
            flush=True,
        )


if __name__ == "__main__":
    main()
