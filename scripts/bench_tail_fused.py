"""Fused decoder-tail Pallas kernel vs the XLA chain, on hardware.

Shapes are the serving decoder's actual tail: (B, 64, 64, 32) input,
3x3 SAME 32->32 conv + per-element PReLU + 3x3 SAME 32->12 conv + relu
(ConvT_7 + PReLU_9 + band Conv_0, models/vae.py).  Comparison arms:

    xla-high     the fidelity mode's arithmetic today (3-pass RTZ)
    xla-highest  the 6-pass arm
    xla-default  1-pass lower bound for the XLA formulation
    pallas       fused kernel (RNE 3-term limbs, one HBM pass)

Usage: python scripts/bench_tail_fused.py [batch] [tile]
"""

import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.kernels.tail_fused import (
    fused_tail_pair,
    fused_tail_pair_reference,
)
from debvader_tpu.utils.compile_cache import enable_compilation_cache
from debvader_tpu.utils.timing import median_seconds_per_iter

enable_compilation_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 16
H = W = 64
CIN, C1, C2 = 32, 32, 12


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, CIN, C1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(C1,)) * 0.1, jnp.float32)
    a1 = jnp.asarray(rng.normal(size=(H, W, C1)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, C1, C2)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C2,)) * 0.1, jnp.float32)

    # Truth: the 6-pass HIGHEST arm (~1e-6-grade — adequate to grade
    # 1e-5-class schemes; an in-process CPU-backend reference hangs for
    # minutes in this environment's mixed axon/cpu process).
    print("computing highest-precision reference...", flush=True)
    ref = np.asarray(
        jax.jit(
            lambda x: fused_tail_pair_reference(
                x, w1, b1, a1, w2, b2, precision=jax.lax.Precision.HIGHEST
            )
        )(x[:64])
    )
    print("reference done", flush=True)

    arm_filter = sys.argv[3] if len(sys.argv) > 3 else ""
    arms = {
        "xla-default": jax.jit(
            lambda x: fused_tail_pair_reference(x, w1, b1, a1, w2, b2)
        ),
        "xla-high": jax.jit(
            lambda x: fused_tail_pair_reference(
                x, w1, b1, a1, w2, b2, precision=jax.lax.Precision.HIGH
            )
        ),
        "xla-highest": jax.jit(
            lambda x: fused_tail_pair_reference(
                x, w1, b1, a1, w2, b2, precision=jax.lax.Precision.HIGHEST
            )
        ),
        "pallas": jax.jit(
            lambda x: fused_tail_pair(x, w1, b1, a1, w2, b2, tile=TILE)
        ),
    }
    # output feeds nothing shape-compatible (12ch) — chain via input refresh
    for name, f in arms.items():
        if arm_filter and arm_filter not in name:
            continue
        print(f"{name}: compiling/checking...", flush=True)
        y = np.asarray(f(x[:64]))
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-9)

        def step(prev, f=f):
            # data dependency: mix a scalar of the previous output back in
            return f(x * (1.0 + 0.0 * prev.sum()))

        # direct chain: reuse x but depend on prev via a cheap scalar
        dt = median_seconds_per_iter(
            lambda prev, f=f: f(
                x if prev is None else x + 0.0 * prev[:1, :1, :1, :1].sum()
            ),
            iters=10, warmup_iters=3, reps=5,
        )
        print(
            f"{name:>12}: {dt * 1e3:7.2f} ms  rel err vs cpu-f32 {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
