"""Detect-core microbenchmark at the production 4k workload shape
(16 tiles x 1024^2): device core time for the three backends —

  xla    : XLA conv chain + XLA select loop (use_pallas_select=False)
  select : XLA conv chain + Pallas label_select fixpoint (r2 default)
  fused  : fused Pallas filter+threshold+parents + label_select (r3 default)

Also checks label parity across backends on the same input.  Timing uses
bench.py's differential data-dependency-chain methodology (the environment's
runtime can ack block_until_ready early).

Usage: python scripts/bench_detect.py [n_tiles] [tile_f]
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from debvader_tpu.config import DetectionConfig
from debvader_tpu.ops import detection as det
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def build_tiles(t=16, f=1024, n_src_per_tile=250, noise=0.004, seed=0):
    rng = np.random.default_rng(seed)
    tiles = (noise * rng.normal(size=(t, f, f))).astype(np.float32)
    yy, xx = np.mgrid[-6:7, -6:7]
    prof = np.exp(-(yy**2 + xx**2) / (2 * 1.6**2)).astype(np.float32)
    for k in range(t):
        ys = rng.uniform(10, f - 10, n_src_per_tile).astype(int)
        xs = rng.uniform(10, f - 10, n_src_per_tile).astype(int)
        amps = rng.uniform(0.3, 5.0, n_src_per_tile)
        for cy, cx, a in zip(ys, xs, amps):
            tiles[k, cy - 6 : cy + 7, cx - 6 : cx + 7] += a * prof
    return tiles


def core_fn(cfg):
    """Jitted (xs) -> (labels, filt, grms) for the backend in cfg."""
    if det._fused_enabled(cfg):
        return lambda xs: det._detect_core_stack(xs, cfg)

    @jax.jit
    def fn(xs):
        labels, is_peak, filt, fore, grms = jax.vmap(
            lambda im: det._detect_core(im, cfg)
        )(xs)
        return labels, filt, grms

    return fn


def time_core(fn, xs, iters=5):
    """Differential chained timing (debvader_tpu.utils.timing): each
    iteration perturbs the input from the previous labels so runs cannot
    be elided.  Slicing [0] outside the jitted fn keeps all core outputs
    computed while handing the helper one array to chain on."""
    from debvader_tpu.utils.timing import feed_seconds_per_iter

    return feed_seconds_per_iter(lambda x: fn(x)[0], xs, iters=iters)


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    print(f"backend={jax.default_backend()} stack=({t},{f},{f})", flush=True)
    xs = jnp.asarray(build_tiles(t, f))

    base = DetectionConfig(threshold_scaling="matched", thresh=25.0)
    variants = {
        "xla": dataclasses.replace(base, use_pallas_select=False, use_pallas_fused=False),
        "select": dataclasses.replace(base, use_pallas_select=True, use_pallas_fused=False),
        "fused": dataclasses.replace(base, use_pallas_fused=True),
    }

    results = {}
    labels_ref = None
    for name, cfg in variants.items():
        fn = core_fn(cfg)
        labels, filt, grms = fn(xs)
        labels_np = np.asarray(labels)
        if name == "xla":
            labels_ref = labels_np
        else:
            same = np.array_equal(labels_np, labels_ref)
            n_diff = int((labels_np != labels_ref).sum())
            print(f"{name}: labels identical to xla = {same} (diff px: {n_diff})")
        dt = time_core(fn, xs)
        results[name] = dt
        print(f"{name}: core {dt * 1e3:.1f} ms", flush=True)

    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
