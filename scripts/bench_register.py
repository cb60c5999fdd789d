"""Windowed vs full-field batched registration on hardware.

The reference's position optimizer (deblend_cutout/optimization.py:36-47)
minimizes the residual over the WHOLE field per source; the round-2 port
kept that shape (ops/registration.py position_optimization_batch), making
each Gauss-Newton iteration O(N * F^2) — unusable at survey scale.  The
windowed solver (position_optimization_batch_windowed) exploits that the
shift Jacobian is zero outside the stamp's support, so a stamp+margin
window yields the same normal equations: O(N * win^2).

This script measures both at a field size where the full-field solve is
still runnable, then the windowed solve alone at survey scale.

Usage: python scripts/bench_register.py [field_size] [n_src]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from debvader_tpu.ops.registration import (
    position_optimization_batch,
    position_optimization_batch_windowed,
)
from debvader_tpu.utils.compile_cache import enable_compilation_cache
from debvader_tpu.utils.timing import median_seconds_per_iter

enable_compilation_cache()


def run(field_size: int, n_src: int, full_field: bool):
    rng = np.random.default_rng(0)
    s = 59
    field = (0.01 * rng.normal(size=(field_size, field_size))).astype(np.float32)
    lo = -(field_size // 2) + s
    hi = field_size // 2 - s
    dets = rng.uniform(lo, hi, size=(n_src, 2)).astype(np.float32)
    # physical workload: Gaussian sources planted at det + a sub-pixel
    # residual, so the two solvers chase the same well-defined minimum
    # (random preds on noise give a flat objective where float noise picks
    # arbitrary bound-clipped fixed points)
    yy, xx = np.mgrid[:s, :s].astype(np.float32)
    preds = np.stack(
        [
            a * np.exp(-((yy - s // 2) ** 2 + (xx - s // 2) ** 2) / (2 * sig**2))
            for a, sig in zip(
                rng.uniform(1, 3, n_src), rng.uniform(1.5, 4.0, n_src)
            )
        ]
    ).astype(np.float32)
    resid_true = rng.uniform(-1.5, 1.5, size=(n_src, 2)).astype(np.float32)
    pos0 = (field_size - s) // 2
    for p, d, r in zip(preds, dets, resid_true):
        iy, ix = int(np.floor(d[0] + r[0])), int(np.floor(d[1] + r[1]))
        fy, fx = d[0] + r[0] - iy, d[1] + r[1] - ix
        pp = np.zeros((s + 1, s + 1), np.float32)
        pp[:s, :s] = p
        sh = (
            fy * np.roll(pp, 1, 0) + (1 - fy) * pp
        )
        sh = fx * np.roll(sh, 1, 1) + (1 - fx) * sh
        y0, x0 = pos0 + iy, pos0 + ix
        if 0 <= y0 and y0 + s + 1 <= field_size and 0 <= x0 and x0 + s + 1 <= field_size:
            field[y0 : y0 + s + 1, x0 : x0 + s + 1] += sh

    field_d = jnp.asarray(field)
    preds_d = jnp.asarray(preds)
    dets_d = jnp.asarray(dets)

    def step_windowed(_):
        return position_optimization_batch_windowed(field_d, preds_d, dets_d)

    tw = median_seconds_per_iter(step_windowed, iters=3, warmup_iters=1)
    print(
        f"windowed  F={field_size} N={n_src}: {tw * 1e3:9.1f} ms/call "
        f"({tw / n_src * 1e6:7.1f} us/src)"
    )

    if full_field:
        def step_full(_):
            return position_optimization_batch(field_d, preds_d, dets_d)

        tf_ = median_seconds_per_iter(step_full, iters=3, warmup_iters=1)
        print(
            f"full-field F={field_size} N={n_src}: {tf_ * 1e3:9.1f} ms/call "
            f"({tf_ / n_src * 1e6:7.1f} us/src)  -> windowed {tf_ / tw:.1f}x"
        )
        a = np.asarray(step_windowed(None))
        b = np.asarray(step_full(None))
        print(f"max |windowed - full| = {np.abs(a - b).max():.2e}")


if __name__ == "__main__":
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print(f"devices: {jax.devices()}")
    # full-field comparison only at small scale: at F=1024 N=512 the
    # full-field solve needs 32.5 GB HBM and does not even compile
    run(f, n, full_field=True)
    run(1024, 512, full_field=False)
    # survey scale, windowed only (full-field would be N x F^2 x 2 jacobians)
    run(4096, 4096, full_field=False)
