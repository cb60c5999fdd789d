"""Roofline lemma: NO 2-MXU-pass arithmetic meets the <=1e-4 flux clause.

The r4 per-layer sensitivity table proved no layer tolerates 1-pass
DEFAULT.  This closes the remaining gap for the r5 roofline argument
(docs/ROOFLINE.md): measure the model-level flux error of every 2-term
limb scheme — both cross-term orientations x both rounding modes — with
and without flux calibration, uniformly across all layers, on the
converged sim_demo weights (CPU, explicit limb arithmetic = exact TPU
semantics for bf16 products).

If even the BEST 2-pass variant + calibration lands far above 1e-4, then
3 passes/layer is the arithmetic floor for any compliant serving mode,
and the compliant-throughput ceiling is the 3-pass MXU roofline.

Writes results/two_pass_floor.json.  Runs on CPU.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from debvader_tpu.config import ModelConfig  # noqa: E402
from debvader_tpu.data.simulate import simulate_batch  # noqa: E402
from debvader_tpu.models import precision as mp  # noqa: E402
from debvader_tpu.models.vae import DeblenderVAE  # noqa: E402
from debvader_tpu.training.checkpoint import load_deblender  # noqa: E402
from debvader_tpu.utils.flux_cal import (  # noqa: E402
    apply_flux_calibration,
    attach_flux_calibration,
)

OUT = Path(__file__).resolve().parent.parent / "results" / "two_pass_floor.json"

# the two orientations x two rounding modes; bf16x2/bf16x2t ship in
# SCHEMES, the (0,1)-orientation variants are injected here for the probe
mp.SCHEMES.setdefault("bf16x2b", (2, ((0, 0), (0, 1)), "rne"))
mp.SCHEMES.setdefault("bf16x2bt", (2, ((0, 0), (0, 1)), "rtz"))
ModelConfig._RUNGS = tuple(ModelConfig._RUNGS) + ("bf16x2b", "bf16x2bt")

LAYER_KEYS = (
    [f"enc/Conv_{i}" for i in range(8)]
    + ["enc/Dense_0", "dec/Dense_0", "dec/Dense_1"]
    + [f"dec/ConvT_{i}" for i in range(8)]
    + ["dec/Conv_0"]
)


def main():
    _, variables = load_deblender("sim_demo")
    ref_model = DeblenderVAE(ModelConfig())  # true fp32 on CPU
    test = jnp.asarray(
        np.asarray(simulate_batch(jax.random.PRNGKey(7), 128)[0], np.float32)
    )
    core = {k: variables[k] for k in ("params", "batch_stats")}
    tr = np.asarray(
        ref_model.apply(core, test, z_mode="mean")[0].loc, np.float64
    ).sum(axis=(1, 2, 3))

    def max_rel(a):
        return float(
            np.max(
                np.abs(np.asarray(a, np.float64).sum(axis=(1, 2, 3)) - tr)
                / np.abs(tr)
            )
        )

    results = {}
    for scheme in ("bf16x2", "bf16x2t", "bf16x2b", "bf16x2bt", "bf16x3t"):
        cfg = ModelConfig(
            layer_precision={k: scheme for k in LAYER_KEYS}
        )
        model = DeblenderVAE(cfg)
        cal_vars = attach_flux_calibration(model, variables, n=64)
        dist, _ = model.apply(core, test, z_mode="mean")
        raw = max_rel(dist.loc)
        cal = max_rel(apply_flux_calibration(dist, cal_vars).loc)
        results[scheme] = {"raw_max_flux_rel_err": raw, "cal": cal}
        print(f"{scheme:10s} raw {raw:.3e}  calibrated {cal:.3e}", flush=True)
        OUT.write_text(json.dumps(results, indent=1))

    best = min(
        min(v.values())
        for k, v in results.items()
        if k.startswith("bf16x2")  # the 3-pass bf16x3t row is the control
    )
    results["_conclusion"] = {
        "best_two_pass_any_variant_any_calibration": best,
        "clause": 1e-4,
        "floor_established": best > 1e-4,
    }
    OUT.write_text(json.dumps(results, indent=1))
    print(f"best 2-pass variant (cal'd): {best:.3e} vs clause 1e-4")


if __name__ == "__main__":
    main()
