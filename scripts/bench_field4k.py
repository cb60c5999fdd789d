"""Steady-state stage timings for the 4k x 4k coadd pipeline (BASELINE.md
config 4).  Builds a synthetic survey coadd (default ~4000 galaxies over a
flat background, matching round-1's benchmark construction), then times each
stage twice and reports the second (steady-state) run — first calls include
jit compiles, which dominate through this environment's TPU tunnel.

Usage: python scripts/bench_field4k.py [field_size] [n_src] [serving_only]

``serving_only`` (any third arg): skip the reference-contract stages
(deblend_field / residual_field) whose per-source stamp downloads scale
O(N x 59^2 x 6 x 2) — at 12k+/30k+ sources that is >10 GB through this
environment's tunnel.  The serving path (detect + deblend_and_render)
downloads only catalog scalars + the final field.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from debvader_tpu.config import DetectionConfig, ModelConfig, PipelineConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.pipeline.tiles import TiledDeblendField, detect_objects_tiled
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def build_coadd(f=4096, n_src=4000, bands=6, noise=0.004, seed=0):
    rng = np.random.default_rng(seed)
    img = (noise * rng.normal(size=(f, f))).astype(np.float32)
    ys = rng.uniform(10, f - 10, n_src)
    xs = rng.uniform(10, f - 10, n_src)
    amps = rng.uniform(0.3, 5.0, n_src)
    yy, xx = np.mgrid[-6:7, -6:7]
    prof = np.exp(-(yy**2 + xx**2) / (2 * 1.6**2)).astype(np.float32)
    for cy, cx, a in zip(ys.astype(int), xs.astype(int), amps):
        img[cy - 6 : cy + 7, cx - 6 : cx + 7] += a * prof
    field = np.repeat(img[:, :, None], bands, axis=-1)[None]
    return field


def main():
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_src = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    print(f"backend={jax.default_backend()} field={f} n_src={n_src}", flush=True)
    field = build_coadd(f, n_src)

    # round-1-comparable workload: 'matched' significance scaling with a
    # threshold that detects the ~n_src real sources and no noise peaks
    # (the default sep_conv/1.5 setting on this synthetic admits ~1.5-sigma
    # noise bumps and balloons the workload to >1e5 detections — that case
    # is exercised separately for robustness).
    det_cfg = DetectionConfig(threshold_scaling="matched", thresh=25.0)
    model = DeblenderVAE(ModelConfig(dtype="bfloat16"))
    variables = init_vae(model, jax.random.PRNGKey(0))
    # BENCH_DEVICE_DTYPE=bfloat16 switches the resident full-field device
    # buffers (memoized field, render canvas) to half precision — required
    # for 16k x 16k x 6 on a 16 GB chip (float32 residency is ~13 GB).
    ddtype = os.environ.get("BENCH_DEVICE_DTYPE") or None
    tdf = TiledDeblendField(
        (model, variables),
        field,
        cfg=PipelineConfig(),
        det_cfg=det_cfg,
        device_dtype=ddtype,
    )

    def stage(name, fn, repeats=2):
        out = None
        for i in range(repeats):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            tag = "compile+run" if i == 0 else "steady"
            print(f"{name} [{tag}]: {dt:.2f}s", flush=True)
        return out

    serving_only = len(sys.argv) > 3

    centers = stage("detect_tiled", tdf.detect)
    print(f"  detections: {len(centers)}", flush=True)
    print(
        "  detect stages (steady): "
        + " ".join(f"{k}={v:.3f}s" for k, v in tdf.detect_timings.items()),
        flush=True,
    )
    if not serving_only:
        res = stage("deblend_field", lambda: tdf.deblend_field(centers))
        print(f"  deblended: {len(res.cutout_images)}", flush=True)
        stage("residual_field", lambda: tdf.get_residual_field(res))
    # fused serving path: stamps stay on device, only catalog + final field
    # cross the host link.  BENCH_TRANSFER_DTYPE=bfloat16 halves the final
    # field download (the dominant byte cost at 8k+).
    tdtype = os.environ.get("BENCH_TRANSFER_DTYPE") or None
    # BENCH_OPTIMISE_POSITIONS=1 runs the serve with per-source subpixel
    # registration (windowed Gauss-Newton) — viable at survey scale since
    # the O(win^2) windowed solver (scripts/bench_register.py)
    optimise = bool(os.environ.get("BENCH_OPTIMISE_POSITIONS"))
    cat_res = stage(
        "deblend_and_render",
        lambda: tdf.deblend_and_render(
            centers, optimise_positions=optimise, transfer_dtype=tdtype
        ),
    )
    print(f"  catalog rows: {len(cat_res[0])}", flush=True)
    print(
        "  serving stages (steady): "
        + " ".join(f"{k}={v:.3f}s" for k, v in tdf.serving_timings.items()),
        flush=True,
    )


if __name__ == "__main__":
    main()
