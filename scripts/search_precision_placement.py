"""Per-layer MXU precision placement search (error side, CPU).

Goal (VERDICT r3 #1): a serving mode meeting the <=1e-4 flux-fidelity
clause at materially more than HIGH's 57.9k stamps/s.  The error side of
the search runs entirely on host: models/precision.py executes any rung as
explicit bf16-limb contractions, which on the CPU backend reproduces TPU
MXU arithmetic up to fp32 summation order.  The reference signal is the
true-fp32 forward (the stand-in for the reference Keras output,
/root/reference/src/debvader/model/model.py:164-218).

Subcommands:
    ladder        uniform-rung flux errors (calibrates the emulation against
                  the TPU-measured ladder: default 6.7e-3 / high 1.85e-4 /
                  highest 1.1e-6, BASELINE.md r3)
    sensitivity   per-layer, per-rung error with every OTHER layer exact ->
                  results/precision_sensitivity.json (incremental)
    search        greedy cost/error placement from the sensitivity table +
                  a hardware cost table (scripts/profile_layer_cost.py),
                  validating candidates with full emulated evals
    eval K=R,...  full emulated error of one explicit placement

Usage: python scripts/search_precision_placement.py ladder [batch]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from debvader_tpu.config import ModelConfig  # noqa: E402
from debvader_tpu.models.vae import DeblenderVAE  # noqa: E402

RESULTS = Path(__file__).resolve().parent.parent / "results"

LAYER_KEYS = (
    [f"enc/Conv_{i}" for i in range(8)]
    + ["enc/Dense_0", "dec/Dense_0", "dec/Dense_1"]
    + [f"dec/ConvT_{i}" for i in range(8)]
    + ["dec/Conv_0"]
)

# rung -> MXU pass count on a lane-full layer (cost model input; lane-starved
# layers pay ~#distinct-x-limbs instead, profile_layer_cost.py measures both)
PASSES = {
    "default": 1, "bf16x1": 1, "high": 3, "bf16x3t": 3, "bf16x3": 3,
    "bf16x4": 4, "bf16x5": 5, "highest": 6, "bf16x6": 6, "bf16x9": 9,
}


def _setup(batch=256):
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.training.checkpoint import load_deblender

    _, variables = load_deblender("sim_demo")
    test = jnp.asarray(
        np.asarray(simulate_batch(jax.random.PRNGKey(7), batch)[0], np.float32)
    )
    model = DeblenderVAE(ModelConfig())
    ref = np.asarray(
        jax.jit(lambda v, im: model.apply(v, im, z_mode="mean")[0].loc)(
            variables, test
        ),
        np.float64,
    )
    return variables, test, ref


def flux_err(variables, test, ref, **cfg_overrides):
    """(mean, max) per-stamp total-flux relative error vs the fp32 ref."""
    model = DeblenderVAE(ModelConfig(**cfg_overrides))
    loc = np.asarray(
        jax.jit(lambda v, im: model.apply(v, im, z_mode="mean")[0].loc)(
            variables, test
        ),
        np.float64,
    )
    tr = ref.sum(axis=(1, 2, 3))
    tot = loc.sum(axis=(1, 2, 3))
    rel = np.abs(tot - tr) / np.maximum(np.abs(tr), 1e-9)
    return float(rel.mean()), float(rel.max())


def cmd_ladder(batch):
    variables, test, ref = _setup(batch)
    print(f"batch={batch}  (emulated-TPU arithmetic on CPU)", flush=True)
    for rung in ("bf16x1", "bf16x3", "bf16x4", "bf16x5", "bf16x6", "bf16x9"):
        mean, mx = flux_err(
            variables, test, ref,
            layer_precision={k: rung for k in LAYER_KEYS},
        )
        print(f"uniform {rung:>7}: flux rel err mean {mean:.3e} max {mx:.3e}",
              flush=True)


def cmd_sensitivity(batch):
    """Per-layer error: every other layer at native fp32 (exact on CPU),
    the probed layer at the probed rung.  Incremental JSON output."""
    variables, test, ref = _setup(batch)
    RESULTS.mkdir(exist_ok=True)
    out_path = RESULTS / "precision_sensitivity.json"
    table = json.loads(out_path.read_text()) if out_path.exists() else {}
    # bf16x1 = native DEFAULT, bf16x3t = native HIGH (RTZ — hardware-
    # validated emulation); bf16x3/x4 are the explicit RNE rungs viable on
    # small-activation layers.
    rungs = ("bf16x1", "bf16x3t", "bf16x3", "bf16x4")
    for key in LAYER_KEYS:
        row = table.setdefault(key, {})
        for rung in rungs:
            if rung in row:
                continue
            mean, mx = flux_err(
                variables, test, ref, layer_precision={key: rung}
            )
            row[rung] = {"mean": mean, "max": mx}
            print(f"{key:>14} {rung}: mean {mean:.3e} max {mx:.3e}", flush=True)
            out_path.write_text(json.dumps(table, indent=1))
    print(f"wrote {out_path}")


def _load_tables():
    sens = json.loads((RESULTS / "precision_sensitivity.json").read_text())
    cost_path = RESULTS / "layer_cost.json"
    cost = json.loads(cost_path.read_text()) if cost_path.exists() else None
    return sens, cost


def cmd_search(batch, budget=1e-4, margin=0.6):
    """Greedy demotion: start all-highest-equivalent, repeatedly demote the
    layer rung with the best (cost saved)/(quadrature error added) while the
    quadrature-model total stays under margin*budget; validate the final
    placement (and the best few intermediates) with full emulated evals."""
    variables, test, ref = _setup(batch)
    sens, cost = _load_tables()

    def layer_cost(key, rung):
        if cost and key in cost and rung in cost[key]:
            return cost[key][rung]
        # fallback: passes x relative MAC weight (crude; hardware table wins)
        return PASSES[rung] * MAC_WEIGHT[key]

    placement = {k: "bf16x6" for k in LAYER_KEYS}

    def model_err(pl):
        return sum(sens[k][pl[k]]["max"] ** 2 for k in LAYER_KEYS if pl[k] in sens[k]) ** 0.5

    ladder = ["bf16x6", "bf16x5", "bf16x4", "bf16x3", "bf16x1"]
    target = budget * margin
    while True:
        best = None
        for k in LAYER_KEYS:
            cur = placement[k]
            nxt_i = ladder.index(cur) + 1
            if nxt_i >= len(ladder):
                continue
            nxt = ladder[nxt_i]
            trial = dict(placement, **{k: nxt})
            e = model_err(trial)
            if e > target:
                continue
            gain = layer_cost(k, cur) - layer_cost(k, nxt)
            dcost = e - model_err(placement)
            score = gain / max(dcost, 1e-12)
            if best is None or score > best[0]:
                best = (score, k, nxt, e)
        if best is None:
            break
        _, k, nxt, e = best
        placement[k] = nxt
        print(f"demote {k} -> {nxt}  model err {e:.3e}  "
              f"cost {sum(layer_cost(q, placement[q]) for q in LAYER_KEYS):.1f}",
              flush=True)
    mean, mx = flux_err(variables, test, ref, layer_precision=placement)
    print("final placement:", json.dumps(placement))
    print(f"validated (emulated): mean {mean:.3e} max {mx:.3e}")
    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "precision_placement.json").write_text(
        json.dumps({"placement": placement, "emulated_mean": mean,
                    "emulated_max": mx}, indent=1)
    )


# Relative 1-pass MAC weight per layer for the default 59x59x6 architecture
# (batch-normalized units; used only when no hardware cost table exists).
def _mac_weights():
    w = {}
    s, f = 59, [32, 64, 128, 256]
    cin = 6
    sizes = [s]
    for _ in f:
        sizes.append(-(-sizes[-1] // 2))
    for i, ch in enumerate(f):
        w[f"enc/Conv_{2*i}"] = sizes[i] ** 2 * 9 * cin * ch
        w[f"enc/Conv_{2*i+1}"] = sizes[i + 1] ** 2 * 9 * ch * ch
        cin = ch
    w["enc/Dense_0"] = sizes[-1] ** 2 * 256 * 560
    w["dec/Dense_0"] = 32 * 560
    w["dec/Dense_1"] = 560 * sizes[-1] ** 2 * 256
    rev = list(range(len(f) - 1, -1, -1))
    cin = f[-1]
    sz = sizes[-1]
    ti = 0
    for i in rev:
        w[f"dec/ConvT_{ti}"] = sz**2 * 9 * cin * f[i]; ti += 1
        sz *= 2
        w[f"dec/ConvT_{ti}"] = sz**2 * 9 * f[i] * f[i]; ti += 1
        cin = f[i]
    w["dec/Conv_0"] = sz**2 * 9 * f[0] * 12
    tot = sum(w.values())
    return {k: v / tot for k, v in w.items()}


MAC_WEIGHT = _mac_weights()


def cmd_eval(batch, spec):
    variables, test, ref = _setup(batch)
    placement = dict(kv.split("=") for kv in spec.split(","))
    mean, mx = flux_err(variables, test, ref, layer_precision=placement)
    print(f"{spec}: mean {mean:.3e} max {mx:.3e}")


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "ladder"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    if cmd == "ladder":
        cmd_ladder(batch)
    elif cmd == "sensitivity":
        cmd_sensitivity(batch)
    elif cmd == "search":
        cmd_search(batch)
    elif cmd == "eval":
        cmd_eval(batch, sys.argv[3])
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")


if __name__ == "__main__":
    main()
