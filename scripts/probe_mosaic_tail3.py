"""Mosaic probe round 3: dispatch-overhead correction + crash isolation.

Round 2 found suspiciously low rates (copy ~145 GB/s, mm ~46-51 TMAC/s on
a 98.5 TMAC/s-peak v5e) — if each chained iteration pays a fixed axon
dispatch cost, small programs under-report.  Here:
 - size-sweep the same op to fit time = overhead + work/rate;
 - isolate which concat forms crash the Mosaic compiler (HTTP 500s);
 - try scratch-ref stores as the K-build alternative.
"""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from debvader_tpu.utils.timing import feed_seconds_per_iter  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "results" / "mosaic_probes3.json"
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


def per_image(kernel, out_shape_tail, x, extras=()):
    n = x.shape[0]
    in_specs = [
        pl.BlockSpec((1,) + x.shape[1:], lambda b: (b,) + (0,) * (x.ndim - 1),
                     memory_space=pltpu.VMEM)
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extras]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n,) + out_shape_tail, jnp.float32),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1,) + out_shape_tail, lambda b: (b,) + (0,) * len(out_shape_tail),
                               memory_space=pltpu.VMEM),
    )(x, *extras)


# -------------------------------------------------- overhead + rate sweeps

def probe_overhead():
    """~zero-work jitted program: chained per-iteration floor."""
    def build():
        x = jnp.ones((8, 128), jnp.float32)
        fn = lambda x: x + 1.0
        return fn, x, {}
    return run("dispatch_overhead_xla", build, iters=16)


def probe_overhead_pallas():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def build():
        x = jnp.ones((8, 128), jnp.float32)
        fn = lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        return fn, x, {}
    return run("dispatch_overhead_pallas", build, iters=16)


def probe_copy_sweep():
    """copy at 3 sizes -> fit overhead + true BW."""
    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0]

    times = {}
    for b in (256, 1024, 4096):
        def build(b=b):
            x = jnp.ones((b, 1152, 128), jnp.float32)
            fn = lambda x: per_image(kernel, (1152, 128), x)
            return fn, x, {"gb": round(2 * b * 1152 * 128 * 4 / 1e9, 3)}
        t = run(f"copy_b{b}", build)
        if t:
            times[b] = t
    if len(times) >= 2:
        bs = sorted(times)
        d_gb = 2 * (bs[-1] - bs[0]) * 1152 * 128 * 4 / 1e9
        d_t = times[bs[-1]] - times[bs[0]]
        bw = d_gb / d_t if d_t > 0 else float("nan")
        ovh = times[bs[0]] - 2 * bs[0] * 1152 * 128 * 4 / 1e9 / bw
        record("derived_bw_fit", ok=True, bw_gbps=round(bw, 1),
               overhead_ms=round(ovh * 1e3, 2))


def probe_mm_sweep():
    """dense bf16 mm at 2 work scales -> fit overhead + true TMAC rate."""
    M, K, N = 2048, 512, 512

    def mk(loops, b):
        def kernel(x_ref, w_ref, o_ref):
            x = x_ref[0]
            acc = jnp.zeros((M, N), jnp.float32)
            for i in range(loops):
                acc += jax.lax.dot_general(
                    x, w_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[0] = acc

        def build():
            x = jnp.ones((b, M, K), jnp.bfloat16)
            w = jnp.ones((loops, K, N), jnp.bfloat16)
            fn = lambda x: per_image(kernel, (M, N), x, extras=(w,))
            return fn, x, {"exec_slots": b * loops * M * K * N}
        return build

    t1 = run("mm_dense_l8_b128", mk(8, 128))
    t2 = run("mm_dense_l32_b128", mk(32, 128))
    if t1 and t2:
        d_slots = 128 * 24 * M * K * N
        rate = d_slots / (t2 - t1)
        ovh_plus_bw = t1 - 128 * 8 * M * K * N / rate
        record("derived_mxu_fit", ok=True, tmacs=round(rate / 1e12, 1),
               residual_ms=round(ovh_plus_bw * 1e3, 2))


def probe_mm_shapes():
    """rate table at kernel-relevant padded shapes (loops high enough to
    swamp overhead)."""
    shapes = [
        ("mm_4488x256x256", 4488, 256, 256, 16, 128),
        ("mm_4488x384x128", 4488, 384, 128, 16, 128),
        ("mm_4488x256x128", 4488, 256, 128, 16, 128),
        ("mm_1152x128x128", 1152, 128, 128, 64, 128),
    ]
    for name, M, K, N, loops, b in shapes:
        def kernel(x_ref, w_ref, o_ref, M=M, N=N, loops=loops):
            x = x_ref[0]
            acc = jnp.zeros((M, N), jnp.float32)
            for i in range(loops):
                acc += jax.lax.dot_general(
                    x, w_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[0] = acc

        def build(M=M, K=K, N=N, loops=loops, b=b, kernel=kernel):
            x = jnp.ones((b, M, K), jnp.bfloat16)
            w = jnp.ones((loops, K, N), jnp.bfloat16)
            fn = lambda x: per_image(kernel, (M, N), x, extras=(w,))
            return fn, x, {"exec_slots": b * loops * M * K * N}
        t = run(name, build)
        if t:
            r = RESULTS[name]
            record(name + "_rate", ok=True,
                   tmacs=round(r["exec_slots"] / t / 1e12, 1))


# -------------------------------------------------- concat crash isolation

def probe_concats():
    M = 512

    def try_kernel(name, kernel, out_tail, in_shape=(1024, 128)):
        def build():
            x = jnp.ones((64,) + in_shape, jnp.float32)
            fn = lambda x: per_image(kernel, out_tail, x)
            return fn, x, {}
        run(name, build, iters=4)

    def k_concat2(x_ref, o_ref):
        xv = x_ref[0]
        o_ref[0] = jnp.concatenate([xv[0:M, :32], xv[1:M + 1, :32]], axis=1)

    try_kernel("concat2_narrow_out64", k_concat2, (M, 64))

    def k_concat4(x_ref, o_ref):
        xv = x_ref[0]
        o_ref[0] = jnp.concatenate([xv[i:M + i, :32] for i in range(4)], axis=1)

    try_kernel("concat4_narrow_out128", k_concat4, (M, 128))

    def k_concat6pad(x_ref, o_ref):
        xv = x_ref[0]
        pieces = [xv[i:M + i, :32] for i in range(6)]
        pieces.append(jnp.zeros((M, 64), jnp.float32))
        o_ref[0] = jnp.concatenate(pieces, axis=1)

    try_kernel("concat6pad_out256", k_concat6pad, (M, 256))

    def k_concat_tiles(x_ref, o_ref):
        xv = x_ref[0]
        o_ref[0] = jnp.concatenate([xv[0:M], xv[8:M + 8]], axis=1)

    try_kernel("concat2_full128_out256", k_concat_tiles, (M, 256))

    def k_sub_concat(x_ref, o_ref):
        xv = x_ref[0]
        o_ref[0] = jnp.concatenate([xv[0:M, :], xv[3:M + 3, :]], axis=0)

    try_kernel("concat2_sublane", k_sub_concat, (2 * M, 128))

    def k_sub_concat9(x_ref, o_ref):
        xv = x_ref[0]  # (64, 1024+) wide rows
        taps = [xv[0:64, d:d + 768] for d in range(9)]
        o_ref[0] = jnp.concatenate(taps, axis=0)

    try_kernel("concat9_sublane_wide", k_sub_concat9, (576, 768), in_shape=(64, 1024))


def probe_scratch_store():
    """K-build via narrow lane-slice stores into a VMEM scratch ref."""
    M = 512

    def kernel(x_ref, o_ref, scratch):
        xv = x_ref[0]
        for i in range(6):
            scratch[:, 32 * i : 32 * (i + 1)] = xv[i : M + i, :32]
        scratch[:, 192:] = jnp.zeros((M, 64), jnp.float32)
        o_ref[0] = scratch[...]

    def build():
        x = jnp.ones((64, 1024, 128), jnp.float32)
        fn = lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, M, 256), jnp.float32),
            grid=(64,),
            in_specs=[pl.BlockSpec((1, 1024, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, M, 256), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, 256), jnp.float32)],
        )(x)
        return fn, x, {}
    return run("scratch_narrow_store_kbuild", build, iters=4)


def main():
    record("device", ok=True,
           kind=str(getattr(jax.devices()[0], "device_kind", "?")))
    probe_overhead()
    probe_overhead_pallas()
    probe_copy_sweep()
    probe_mm_sweep()
    probe_mm_shapes()
    probe_concats()
    probe_scratch_store()


if __name__ == "__main__":
    main()
