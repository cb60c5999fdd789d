"""Mosaic lowering + cost probes for the fused decoder-tail kernel (r5).

kernels/tail_fused.py is parked at two documented lowering walls
(128-lane HBM padding of small-channel dims; lane-splitting im2col
reshape).  The r5 unparking candidates need primitives whose lowering
support and THROUGHPUT are unknown:

  pixels-in-M scheme: unpack 4px-packed lanes via lane-rolls + sublane
    stack-reshape, narrow (M,32) elementwise, 6-piece lane concat,
    (M~1.2k, 256)x(256, 256) bf16 matmuls;
  channels-in-sublanes (transposed) scheme: arbitrary-offset lane slices
    on (32, N), 9-piece sublane concat, (128, 640)x(640, N) matmuls.

Each probe compiles standalone and times at batch-grid scale with the
repo's differential chained methodology; results append to
results/mosaic_probes.json as they land (timeout-safe).  Run ON TPU.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from debvader_tpu.utils.timing import feed_seconds_per_iter  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "results" / "mosaic_probes.json"
RESULTS = {}


def record(name, **kw):
    RESULTS[name] = kw
    OUT.write_text(json.dumps(RESULTS, indent=1))
    print(f"[{name}] {kw}", file=sys.stderr, flush=True)


def run(name, build):
    """build() -> (fn, feed, meta).  Compile, time, record."""
    try:
        fn, feed, meta = build()
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(feed)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        dt = feed_seconds_per_iter(jfn, feed, iters=8, warmup_iters=3)
        record(name, ok=True, seconds=dt, compile_s=round(compile_s, 2), **meta)
        return dt
    except Exception as e:  # noqa: BLE001 - probe harness
        record(name, ok=False, error=f"{type(e).__name__}: {e}"[:500])
        return None


# ---------------------------------------------------------------- probes

R, L = 1152, 128          # packed rows per image (~64x68/4 + halo), lanes
B = 1024                  # probe batch (grid)


def _pallas_per_image(kernel, out_rows, out_lanes, x, extras=()):
    n = x.shape[0]
    in_specs = [
        pl.BlockSpec((1,) + x.shape[1:], lambda b: (b,) + (0,) * (x.ndim - 1),
                     memory_space=pltpu.VMEM)
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extras]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, out_rows, out_lanes), jnp.float32),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, out_rows, out_lanes), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, *extras)


def probe_copy():
    """BW floor: read (R,128) f32, write it back."""
    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0]

    def build():
        x = jnp.ones((B, R, L), jnp.float32)
        fn = lambda x: _pallas_per_image(kernel, R, L, x)
        gb = 2 * B * R * L * 4 / 1e9
        return fn, x, {"traffic_gb": round(gb, 2)}

    return run("copy_rw", build)


def probe_ew(n_ops, lanes, name):
    """n_ops chained mul-adds at the given lane width."""
    def kernel(x_ref, o_ref):
        v = x_ref[0][:, :lanes]
        for i in range(n_ops):
            v = v * 1.0001 + 0.001
        o = jnp.zeros((R, L), jnp.float32)
        o_ref[0] = o.at[:, :lanes].set(v) if lanes < L else v

    def build():
        x = jnp.ones((B, R, L), jnp.float32)
        fn = lambda x: _pallas_per_image(kernel, R, L, x)
        return fn, x, {"n_ops": n_ops, "lanes": lanes}

    return run(name, build)


def probe_unpack():
    """4px-packed (R,128) -> (4R,128) via lane-rolls + stack + sublane
    reshape (the wall-2 workaround candidate)."""
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        parts = [x] + [pltpu.roll(x, -32 * j, 1) for j in range(1, 4)]
        o_ref[0] = jnp.stack(parts, axis=1).reshape(4 * R, L)

    def build():
        x = jnp.ones((B, R, L), jnp.float32)
        fn = lambda x: _pallas_per_image(kernel, 4 * R, L, x)
        return fn, x, {}

    return run("unpack_roll_stack_reshape", build)


def probe_repack():
    """(4R,128) channels-in-low-lanes -> packed (R,128): the inverse
    (sublane reshape + lane-rolls + selects)."""
    def kernel(x_ref, o_ref):
        x = x_ref[0].reshape(R, 4, L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        acc = jnp.zeros((R, L), jnp.float32)
        for j in range(4):
            piece = pltpu.roll(x[:, j], 32 * j, 1)
            acc = jnp.where((lane >= 32 * j) & (lane < 32 * (j + 1)), piece, acc)
        o_ref[0] = acc

    def build():
        x = jnp.ones((B, 4 * R, L), jnp.float32)
        fn = lambda x: _pallas_per_image(kernel, R, L, x)
        return fn, x, {}

    return run("repack_reshape_roll_select", build)


def probe_concat6():
    """six (M,32) sublane-sliced pieces -> (M,192) lane concat (the
    pixels-in-M K-build)."""
    M = 4 * R - 8

    def kernel(x_ref, o_ref):
        xv = x_ref[0]
        pieces = [xv[i : i + M, :32] for i in range(6)]
        k = jnp.concatenate(pieces, axis=1)  # (M, 192)
        o = jnp.zeros((M, 256), jnp.float32)
        o_ref[0] = o.at[:, :192].set(k)

    def build():
        x = jnp.ones((B, 4 * R, L), jnp.float32)
        fn = lambda x: _pallas_per_image(kernel, M, 256, x)
        return fn, x, {}

    return run("concat6_lane", build)


def probe_mm_pixM(loops=4):
    """pixels-in-M conv matmul shape: (M, 256)bf16 @ (256, 256)bf16 ->
    f32, looped to lift arithmetic intensity above the input BW."""
    M = 1216

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[0]
        acc = jnp.zeros((M, 256), jnp.float32)
        for i in range(loops):
            acc += jax.lax.dot_general(
                x, w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc

    def build():
        x = jnp.ones((B, M, 256), jnp.bfloat16)
        w = jnp.ones((loops, 256, 256), jnp.bfloat16)
        fn = lambda x: _pallas_per_image(kernel, M, 256, x, extras=(w,))
        slots = B * loops * M * 256 * 256
        return fn, x, {"exec_slots": slots, "loops": loops}

    return run("mm_pixM_256x256", build)


def probe_mm_small_n(loops=4):
    """same M but N=128 with K=256 (conv2-ish shape)."""
    M = 1216

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[0]
        acc = jnp.zeros((M, 128), jnp.float32)
        for i in range(loops):
            acc += jax.lax.dot_general(
                x, w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc

    def build():
        x = jnp.ones((B, M, 256), jnp.bfloat16)
        w = jnp.ones((loops, 256, 128), jnp.bfloat16)
        fn = lambda x: _pallas_per_image(kernel, M, 128, x, extras=(w,))
        slots = B * loops * M * 256 * 128
        return fn, x, {"exec_slots": slots, "loops": loops}

    return run("mm_pixM_256x128", build)


def probe_transposed_build_mm(loops=2):
    """channels-in-sublanes scheme: 9 arbitrary-offset lane slices of
    (64, Np) stacked to (576, N) + (128, 576) @ (576, N) matmul."""
    C2, Np, N = 64, 4352 + 128, 4352  # [xh|xm] stacked rows, halo'd lanes

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[0]  # (C2, Np)
        taps = [x[:, 64 + d : 64 + d + N] for d in (-68, -67, -66, -1, 0, 1, 66, 67, 68)]
        bmat = jnp.concatenate(taps, axis=0)  # (576, N)
        acc = jnp.zeros((128, N), jnp.float32)
        for i in range(loops):
            acc += jax.lax.dot_general(
                w_ref[i], bmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc

    def build():
        x = jnp.ones((B // 2, C2, Np), jnp.bfloat16)
        w = jnp.ones((loops, 128, 576), jnp.bfloat16)
        fn = lambda x: _pallas_per_image(kernel, 128, N, x, extras=(w,))
        slots = (B // 2) * loops * 128 * 576 * N
        return fn, x, {"exec_slots": slots, "loops": loops}

    return run("mm_transposed_128x576xN", build)


def probe_rne():
    """the integer-bitcast RNE split at full width."""
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        bits = jax.lax.bitcast_convert_type(x, jnp.int32)
        rb = jnp.bitwise_and(jax.lax.shift_right_logical(bits, 16), 1)
        r = jnp.bitwise_and(bits + jnp.int32(0x7FFF) + rb, jnp.int32(-65536))
        hi = jax.lax.bitcast_convert_type(r, jnp.float32)
        lo = x - hi
        o_ref[0] = hi + 2.0 * lo  # keep both live

    def build():
        x = jnp.ones((B, R, L), jnp.float32)
        fn = lambda x: _pallas_per_image(kernel, R, L, x)
        return fn, x, {}

    return run("rne_split_full_width", build)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    copy = probe_copy()
    probe_ew(2, 128, "ew2_full")
    probe_ew(18, 128, "ew18_full")
    probe_ew(2, 32, "ew2_narrow")
    probe_ew(18, 32, "ew18_narrow")
    probe_rne()
    probe_unpack()
    probe_repack()
    probe_concat6()
    probe_mm_pixM()
    probe_mm_small_n()
    probe_transposed_build_mm()
    # derived rates
    if copy:
        gb = RESULTS["copy_rw"]["traffic_gb"]
        record("derived_bw_gbps", ok=True, value=round(gb / copy, 1))
    for mm in ("mm_pixM_256x256", "mm_pixM_256x128", "mm_transposed_128x576xN"):
        r = RESULTS.get(mm, {})
        if r.get("ok"):
            record(
                mm + "_rate",
                ok=True,
                exec_slots_per_sec=f"{r['exec_slots'] / r['seconds']:.3e}",
            )
    if RESULTS.get("ew18_full", {}).get("ok") and RESULTS.get("ew2_full", {}).get("ok"):
        per_op = (RESULTS["ew18_full"]["seconds"] - RESULTS["ew2_full"]["seconds"]) / 16
        record("derived_ew_full_per_op_s", ok=True, value=f"{per_op:.3e}",
               elems_per_sec=f"{B * R * L / max(per_op, 1e-12):.3e}")
    if RESULTS.get("ew18_narrow", {}).get("ok") and RESULTS.get("ew2_narrow", {}).get("ok"):
        per_op = (RESULTS["ew18_narrow"]["seconds"] - RESULTS["ew2_narrow"]["seconds"]) / 16
        record("derived_ew_narrow_per_op_s", ok=True, value=f"{per_op:.3e}",
               elems_per_sec=f"{B * R * 32 / max(per_op, 1e-12):.3e}")


if __name__ == "__main__":
    main()
