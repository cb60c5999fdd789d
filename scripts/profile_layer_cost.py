"""Per-layer MXU precision cost table, measured on hardware.

The cost side of the precision-placement search
(scripts/search_precision_placement.py): for each MXU layer, the extra
ms/batch the full serving forward pays when that ONE layer runs at a
higher rung than DEFAULT.  The search's cost model is then additive:

    time(placement) = T_default + sum_l extra[l][rung_l]

Native rungs (high/highest) are measured per layer; explicit bf16-limb
rungs are measured only for the small-activation-map layers where the limb
split's elementwise HBM cost is negligible (the big-map layers pay ~2x the
conv cost in split traffic — measured 208 ms for uniform explicit bf16x3
vs 70.6 ms native high, BASELINE.md r4 — so explicit rungs are only ever
placed on small-map layers).

Writes results/layer_cost.json incrementally:
    {"baseline_ms": float, "extra_ms": {layer: {rung: float}}}

Usage: python scripts/profile_layer_cost.py [batch] [mode]
    mode 'native'   per-layer high + highest           (default)
    mode 'explicit' bf16x4/bf16x5 on small-map layers
"""

import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.config import ModelConfig
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

RESULTS = Path(__file__).resolve().parent.parent / "results"
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
MODE = sys.argv[2] if len(sys.argv) > 2 else "native"

LAYER_KEYS = (
    [f"enc/Conv_{i}" for i in range(8)]
    + ["enc/Dense_0", "dec/Dense_0", "dec/Dense_1"]
    + [f"dec/ConvT_{i}" for i in range(8)]
    + ["dec/Conv_0"]
)

# Layers whose input activation maps are small (<= 15x15 spatial, or dense):
# explicit limb splitting is bandwidth-cheap here.
SMALL_MAP = (
    ["enc/Conv_4", "enc/Conv_5", "enc/Conv_6", "enc/Conv_7",
     "enc/Dense_0", "dec/Dense_0", "dec/Dense_1",
     "dec/ConvT_0", "dec/ConvT_1", "dec/ConvT_2", "dec/ConvT_3"]
)


def measure_ms(layer_precision) -> float:
    from debvader_tpu.training.checkpoint import load_deblender
    from debvader_tpu.utils.timing import median_seconds_per_iter

    model = DeblenderVAE(
        ModelConfig(dtype="float32", layer_precision=layer_precision)
    )
    _, variables = load_deblender("sim_demo")

    @jax.jit
    def fwd(images, rng):
        dist, _ = model.apply(variables, images, rng=rng)
        return dist.loc

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, 59, 59, 6)), jnp.float32
    )
    rng = jax.random.PRNGKey(1)
    draws = itertools.count()

    def step(prev):
        y = x if prev is None else prev
        return fwd(y, jax.random.fold_in(rng, next(draws)))

    return median_seconds_per_iter(step, iters=10, warmup_iters=3, reps=3) * 1e3


def main():
    RESULTS.mkdir(exist_ok=True)
    out = RESULTS / "layer_cost.json"
    table = (
        json.loads(out.read_text())
        if out.exists()
        else {"baseline_ms": None, "extra_ms": {}}
    )
    if table["baseline_ms"] is None:
        table["baseline_ms"] = measure_ms(None)
        print(f"baseline (all default): {table['baseline_ms']:.2f} ms", flush=True)
        out.write_text(json.dumps(table, indent=1))
    base = table["baseline_ms"]

    jobs = []
    if MODE == "native":
        for key in LAYER_KEYS:
            jobs += [(key, "high"), (key, "highest")]
    elif MODE == "groups":
        # Per-layer deltas (~1-2 ms) sit below this environment's ±8%
        # timing noise at the 47 ms baseline; group-level extras (10-25 ms)
        # are resolvable.  These groups partition the MXU layers by role:
        # where the time goes under a precision upgrade = that group's
        # share of MXU time x 5 extra passes.
        GROUPS = {
            "enc_early": [f"enc/Conv_{i}" for i in range(4)],
            "enc_deep": [f"enc/Conv_{i}" for i in range(4, 8)]
            + ["enc/Dense_0"],
            "dec_deep": ["dec/Dense_0", "dec/Dense_1"]
            + [f"dec/ConvT_{i}" for i in range(4)],
            "dec_tail": [f"dec/ConvT_{i}" for i in range(4, 8)]
            + ["dec/Conv_0"],
        }
        for gname, keys in GROUPS.items():
            jobs.append((gname, "highest", {k: "highest" for k in keys}))
            # r5: the 3-pass rung per group — the roofline for the
            # calibrated-HIGH fidelity mode decomposes over these
            jobs.append((gname, "high", {k: "high" for k in keys}))
    else:
        for key in SMALL_MAP:
            jobs += [(key, "bf16x4"), (key, "bf16x5")]

    for job in jobs:
        key, rung = job[0], job[1]
        placement = job[2] if len(job) > 2 else {key: rung}
        row = table["extra_ms"].setdefault(key, {})
        if rung in row:
            continue
        ms = measure_ms(placement)
        row[rung] = ms - base
        print(f"{key:>14} {rung:>8}: +{ms - base:6.2f} ms  ({ms:.2f} total)",
              flush=True)
        out.write_text(json.dumps(table, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
