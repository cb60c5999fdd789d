"""Mosaic probe round 4: separate per-grid-step overhead from true BW/MXU
rates; cost the scratch-store K-build; find the hardware ceilings via
plain XLA ops (one dispatch, no pallas grid)."""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from debvader_tpu.utils.timing import feed_seconds_per_iter  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "results" / "mosaic_probes4.json"
RESULTS = {}


def record(name, **kw):
    RESULTS[name] = kw
    OUT.write_text(json.dumps(RESULTS, indent=1))
    print(f"[{name}] {kw}", file=sys.stderr, flush=True)


def run(name, build, iters=8):
    try:
        fn, feed, meta = build()
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(feed))
        dt = feed_seconds_per_iter(jfn, feed, iters=iters, warmup_iters=3)
        record(name, ok=True, seconds=dt, **meta)
        return dt
    except Exception as e:  # noqa: BLE001
        record(name, ok=False, error=f"{type(e).__name__}: {e}"[:300])
        return None


# ------------------------------------------------------------- XLA ceilings

def probe_xla_ceilings():
    def build_mm():
        a = jnp.ones((8192, 8192), jnp.bfloat16)
        fn = lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return fn, a, {"macs": 8192**3}
    t = run("xla_mm_8k", build_mm)
    if t:
        record("xla_mm_8k_rate", ok=True, tmacs=round(8192**3 / t / 1e12, 1))

    def build_ew():
        x = jnp.ones((512, 1152, 1024), jnp.float32)  # 2.4 GB
        fn = lambda x: x * 1.0001
        return fn, x, {"gb": round(2 * 512 * 1152 * 1024 * 4 / 1e9, 2)}
    t = run("xla_ew_2g", build_ew)
    if t:
        record("xla_ew_bw", ok=True,
               gbps=round(2 * 512 * 1152 * 1024 * 4 / 1e9 / t, 1))

    # the real tail-chain arms for reference, same methodology
    def build_chain():
        x = jnp.ones((4096, 64, 64, 32), jnp.float32)
        w1 = jnp.ones((3, 3, 32, 32), jnp.float32)
        w2 = jnp.ones((3, 3, 32, 12), jnp.float32)

        def fn(x):
            h = jax.lax.conv_general_dilated(
                x, w1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGH)
            h = jnp.maximum(h, 0.0) + 0.1 * jnp.minimum(h, 0.0)
            return jnp.maximum(jax.lax.conv_general_dilated(
                h, w2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGH), 0.0)
        return fn, x, {}
    run("xla_tail_chain_high", build_chain)


# ---------------------------------------------------- pallas block scaling

def probe_copy_blocks():
    B, R, L = 4096, 1152, 128

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    for g in (1, 4, 16):
        def build(g=g):
            x = jnp.ones((B, R, L), jnp.float32)
            fn = lambda x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, R, L), jnp.float32),
                grid=(B // g,),
                in_specs=[pl.BlockSpec((g, R, L), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((g, R, L), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(x)
            return fn, x, {"programs": B // g,
                           "gb": round(2 * B * R * L * 4 / 1e9, 2)}
        t = run(f"copy_g{g}", build)
        if t:
            record(f"copy_g{g}_rate", ok=True,
                   gbps=round(2 * B * R * L * 4 / 1e9 / t, 1),
                   us_per_program=round(t / (B // g) * 1e6, 2))


def probe_mm_block():
    """mm with 2 images per program and realistic loops: does rate rise
    when per-step overhead amortizes?"""
    M, K, N, loops, b, g = 4488, 256, 256, 8, 256, 2

    def kernel(x_ref, w_ref, o_ref):
        for j in range(g):
            x = x_ref[j]
            acc = jnp.zeros((M, N), jnp.float32)
            for i in range(loops):
                acc += jax.lax.dot_general(
                    x, w_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[j] = acc

    def build():
        x = jnp.ones((b, M, K), jnp.bfloat16)
        w = jnp.ones((loops, K, N), jnp.bfloat16)
        fn = lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, M, N), jnp.float32),
            grid=(b // g,),
            in_specs=[pl.BlockSpec((g, M, K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((g, M, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x, w)
        return fn, x, {"exec_slots": b * loops * M * K * N}
    t = run("mm_g2_4488x256x256", build)
    if t:
        r = RESULTS["mm_g2_4488x256x256"]
        record("mm_g2_rate", ok=True,
               tmacs=round(r["exec_slots"] / t / 1e12, 1))


def probe_narrow_store_cost():
    """n narrow stores into scratch per program: slope = per-store cost."""
    M = 4488

    def mk(nstores):
        def kernel(x_ref, o_ref, scratch):
            xv = x_ref[0]
            for i in range(nstores):
                scratch[:, 32 * (i % 8) : 32 * (i % 8 + 1)] = xv[i : M + i, :32]
            o_ref[0] = scratch[...]

        def build():
            x = jnp.ones((128, M + 16, 128), jnp.float32)
            fn = lambda x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((128, M, 256), jnp.float32),
                grid=(128,),
                in_specs=[pl.BlockSpec((1, M + 16, 128), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, M, 256), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((M, 256), jnp.float32)],
            )(x)
            return fn, x, {"nstores": nstores}
        return build

    t2 = run("nstore2", mk(2))
    t8 = run("nstore8", mk(8))
    if t2 and t8:
        per = (t8 - t2) / 6 / 128
        record("derived_narrow_store", ok=True, us_per_store=round(per * 1e6, 2),
               elems_per_sec=f"{M * 32 / per:.2e}")


def probe_wide_masked_build():
    """K-build alternative: build (M,256) from 6 pieces WITHOUT narrow ops:
    6 full-width (M,128+) shifted sources merged by lane-select, operating
    at 256 lanes throughout."""
    M = 4488

    def kernel(x_ref, o_ref):
        xv = x_ref[0]  # (M+16, 128), channels in lanes 0:32
        lane = jax.lax.broadcasted_iota(jnp.int32, (M, 256), 1)
        acc = jnp.zeros((M, 256), jnp.float32)
        for i in range(6):
            # piece i wanted at lanes [32i, 32i+32); source has it at 0:32
            src = xv[i : M + i, :]  # (M, 128)
            wide = jnp.concatenate([src, src], axis=1)  # (M, 256)
            shifted = pltpu.roll(wide, 32 * i, 1)
            acc = jnp.where((lane >= 32 * i) & (lane < 32 * i + 32), shifted, acc)
        o_ref[0] = acc

    def build():
        x = jnp.ones((64, M + 16, 128), jnp.float32)
        fn = lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, M, 256), jnp.float32),
            grid=(64,),
            in_specs=[pl.BlockSpec((1, M + 16, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, M, 256), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)
        return fn, x, {}
    run("wide_masked_kbuild", build, iters=4)


def main():
    probe_xla_ceilings()
    probe_copy_blocks()
    probe_mm_block()
    probe_narrow_store_cost()
    probe_wide_masked_build()


if __name__ == "__main__":
    main()
