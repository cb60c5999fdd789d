#!/usr/bin/env python
"""int8 quantized serving: calibrate once, serve stamps at int8 MXU rates.

The reference serves in float32 TF eager (deblend_cutout/deblender.py:6-25);
its nearest analogue to a re-expressed serving graph is the tf2onnx export
notebook.  Here the opt-in path is post-training int8 quantization
(models/quantized.py): per-output-channel int8 weights, per-tensor
activation scales calibrated on representative stamps, s8xs8->s32 MXU
accumulation.  Measured accuracy with the round-3 retrained sim_demo
weights: total-stamp flux rel err ~20% mean — NOT photometry-grade on
converged weights (the earlier sub-percent numbers were an artifact of
the barely-trained r2 demo checkpoint); see models/quantized.py's
accuracy note, tests/test_quantized.py and BASELINE.md.  This example
demonstrates the mechanics and the measured envelope.

Run: python examples/quantized_serving.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

import debvader_tpu as dt
from debvader_tpu.data.simulate import simulate_batch
from debvader_tpu.models import quantized as q

STAMPS = "/root/reference/src/debvader/data/dc2_imgs/imgs_dc2.npy"


def main():
    model, variables = dt.load_deblender("sim_demo")

    # 1. Calibrate on representative stamps (a few hundred covering the
    #    survey's flux range; max-abs scales only widen with more data).
    calib, _, _ = simulate_batch(jax.random.PRNGKey(0), 256)
    qv = q.quantize_vae(model, variables, calib)
    print(f"quantized {len(qv.qweights)} layers; calibration amax per layer:")
    for name, amax in sorted(qv.calib_stats.items()):
        print(f"  {name:32s} {amax:10.4f}")

    # 2. Serve.  make_quantized_forward returns a jitted closure; weights
    #    and scales are traced, so recalibration doesn't recompile.
    fwd = q.make_quantized_forward(qv)
    stamps = np.load(STAMPS).astype(np.float32)
    loc, scale = fwd(stamps, jax.random.PRNGKey(1))
    print("served", loc.shape, "mean flux", float(np.asarray(loc).sum(axis=(1, 2, 3)).mean()))

    # 3. Compare against the float path on the same inputs (per-stamp
    #    flux errors — stamp-summed aggregates cancel signed errors and
    #    flatter the result).
    dist, _ = q.quantized_forward(qv, stamps, z_mode="mean", quant=False)
    dq, _ = q.quantized_forward(qv, stamps, z_mode="mean", quant=True)
    lr, lq = np.asarray(dist.loc), np.asarray(dq.loc)

    def per_stamp(a):
        r = lr.sum(axis=(1, 2, 3))
        return np.abs(a.sum(axis=(1, 2, 3)) - r) / np.abs(r)

    print(f"per-stamp flux rel err vs float: mean {per_stamp(lq).mean():.3f}")

    # r5: per-channel activation scales (folded into the weight grid —
    # identical serving path and throughput) cut PTQ divergence ~2-3x when
    # the calibration covers the serving distribution, and QAT
    # (`qat_finetune` / `python -m debvader_tpu quantize --qat-steps 500`)
    # takes it to ~1.5e-2 (BASELINE.md r5).  The CLI defaults to
    # per_channel.  NB per-channel scales are more calibration-sensitive
    # than per-tensor: calibrate on stamps like the ones you will serve
    # (here the real DC2 stamps join the simulated set).
    qv_c = q.quantize_vae(
        model, variables,
        np.concatenate([np.asarray(calib), stamps]),
        act_granularity="per_channel",
    )
    dq_c, _ = q.quantized_forward(qv_c, stamps, z_mode="mean", quant=True)
    print(
        f"per-channel scales, same runtime path: mean "
        f"{per_stamp(np.asarray(dq_c.loc)).mean():.3f}"
    )


if __name__ == "__main__":
    main()
