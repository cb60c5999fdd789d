"""Dense-gemm rate suite: the measured MXU ceiling behind docs/ROOFLINE.md.

Measures XLA matmul throughput at three sizes for bf16 (1-pass) and fp32
at HIGH (3-pass) / HIGHEST (6-pass), so the roofline's two key constants
are pinned by more than one point:
  - the attainable dense bf16 rate (TMAC/s),
  - the pass multipliers of the fp32 precision rungs.
Writes results/gemm_ceiling.json.  Run on TPU, uncontended.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from debvader_tpu.utils.timing import feed_seconds_per_iter

OUT = Path(__file__).resolve().parent.parent / "results" / "gemm_ceiling.json"
RES = {}


def run(name, n, dtype, precision):
    a = jnp.ones((n, n), dtype)

    def fn(a):
        return jnp.dot(
            a, a, precision=precision, preferred_element_type=jnp.float32
        ).astype(dtype)

    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(a))
    dt = feed_seconds_per_iter(jfn, a, iters=6, warmup_iters=2)
    RES[name] = {
        "seconds": dt,
        "tmacs": round(n**3 / dt / 1e12, 1),
    }
    OUT.write_text(json.dumps(RES, indent=1))
    print(f"{name}: {RES[name]['tmacs']} TMAC/s ({dt*1e3:.1f} ms)",
          file=sys.stderr, flush=True)


def main():
    from jax.lax import Precision

    for n in (4096, 8192, 12288):
        run(f"bf16_{n}", n, jnp.bfloat16, None)
    for n in (4096, 8192):
        run(f"f32_high_{n}", n, jnp.float32, Precision.HIGH)
        run(f"f32_highest_{n}", n, jnp.float32, Precision.HIGHEST)
    b = RES.get("bf16_8192", {}).get("tmacs")
    h = RES.get("f32_high_8192", {}).get("tmacs")
    hh = RES.get("f32_highest_8192", {}).get("tmacs")
    if b and h and hh:
        RES["_pass_multipliers_8192"] = {
            "high_vs_bf16": round(b / h, 2),
            "highest_vs_bf16": round(b / hh, 2),
        }
        OUT.write_text(json.dumps(RES, indent=1))
        print(f"pass multipliers @8192: high {b/h:.2f}x, highest {b/hh:.2f}x",
              file=sys.stderr)


if __name__ == "__main__":
    main()
