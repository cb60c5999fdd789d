"""Sweep the label-resolution kernel's K (ancestor steps per HBM pass) and
row-block size at the production detect shape.

Total select compute is ceil(L / K) * K sweeps (L = longest ascent path in
the workload), so small K wastes less compute past the fixpoint but pays
more per-chunk convergence reductions and pad copies; large K amortizes
those but overshoots L.  This measures the real tradeoff on hardware to
pick label_select_fixpoint's default.  Usage:
python scripts/sweep_label_steps.py [n_tiles] [tile_f]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from bench_detect import build_tiles
from debvader_tpu.config import DetectionConfig
from debvader_tpu.ops import detection as det
from debvader_tpu.kernels.detect_fused import matched_filter_parents
from debvader_tpu.kernels.label_select import label_select_fixpoint
from debvader_tpu.utils.compile_cache import enable_compilation_cache

# feed is int32 parent indices: the shared helper's dtype-preserving
# perturbation matters here (a float promotion would time a float32
# variant of the kernel AND round indices >= 2^24)
from debvader_tpu.utils.timing import feed_seconds_per_iter as timeit

enable_compilation_cache()


def main():
    t_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    print(f"backend={jax.default_backend()} stack=({t_n},{f},{f})", flush=True)
    cfg = DetectionConfig(threshold_scaling="matched", thresh=25.0)
    xs = jnp.asarray(build_tiles(t_n, f))
    kernel_np = det.default_filter_kernel(cfg.filter_size, cfg.filter_fwhm)
    scale = float(np.sqrt(np.sum(np.square(kernel_np))))

    bg = jax.jit(jax.vmap(lambda im: det.estimate_background(im, box=64)))
    back, rms, gback, grms = bg(xs)
    jax.block_until_ready(back)
    thr = cfg.thresh * grms * scale
    guarded = jnp.where(jnp.isfinite(xs), xs, back)

    filt_p, dir_p, cur_p = matched_filter_parents(guarded, back, kernel_np, thr)
    tt, p = filt_p.shape[0], filt_p.shape[-1]
    dir2 = dir_p.reshape(tt * p, p)
    cur2 = cur_p.reshape(tt * p, p)

    ref, n_ref = label_select_fixpoint(cur2, dir2, rows=128, steps=16)
    ref = np.asarray(ref)
    print(f"fixpoint chunks at K=16: {int(n_ref)}", flush=True)

    results = {}
    for rows in (128, 256):
        for steps in (2, 4, 6, 8, 12, 16, 24, 32):
            try:
                lab, n = label_select_fixpoint(cur2, dir2, rows=rows, steps=steps)
                same = bool(np.array_equal(np.asarray(lab), ref))
                t = timeit(
                    lambda c, rows=rows, steps=steps: label_select_fixpoint(
                        c, dir2, rows=rows, steps=steps
                    )[0],
                    cur2,
                )
            except Exception as e:  # e.g. scoped-VMEM OOM at big blocks
                print(f"rows={rows:3d} K={steps:2d}: FAILED ({type(e).__name__})")
                continue
            results[(rows, steps)] = t
            print(
                f"rows={rows:3d} K={steps:2d}: {t * 1e3:6.1f} ms  "
                f"chunks={int(n):2d}  labels_match={same}",
                flush=True,
            )
    best = min(results, key=results.get)
    print(f"best: rows={best[0]} K={best[1]} ({results[best] * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
