"""Substage profile of the fused detect core at the production shape:
background mesh, fused Pallas filter+parents, label-resolution fixpoint —
each timed with the differential chained methodology (bench.py), plus the
whole core for cross-checking.  Usage: python scripts/profile_detect_core.py
[n_tiles] [tile_f]
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
    print("bg compiled", flush=True)
    thr = cfg.thresh * grms * scale
    guarded = jnp.where(jnp.isfinite(xs), xs, back)

    t_bg = timeit(lambda x: bg(x)[0], xs)
    print(f"background: {t_bg * 1e3:.1f} ms", flush=True)

    t_mfp = timeit(
        lambda x: matched_filter_parents(x, back, kernel_np, thr)[0], guarded
    )
    print(f"fused filter+parents: {t_mfp * 1e3:.1f} ms", flush=True)

    filt_p, dir_p, cur_p = matched_filter_parents(guarded, back, kernel_np, thr)
    tt, p = filt_p.shape[0], filt_p.shape[-1]
    dir2 = dir_p.reshape(tt * p, p)
    cur2 = cur_p.reshape(tt * p, p)

    t_ls = timeit(lambda c: label_select_fixpoint(c, dir2, rows=128)[0], cur2)
    print(f"label fixpoint: {t_ls * 1e3:.1f} ms", flush=True)

    t_core = timeit(lambda x: det._detect_core_stack(x, cfg)[0], xs)
    print(f"whole core: {t_core * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
