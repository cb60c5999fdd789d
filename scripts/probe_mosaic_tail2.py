"""Mosaic probe round 2: fixes + BW investigation (see probe_mosaic_tail.py).

- roll needs non-negative shifts -> use (128 - 32j) % 128
- .at[].set lowers to unsupported scatter -> build full-width outputs via
  jnp.concatenate instead
- copy_rw measured only ~145 GB/s -> compare XLA elementwise, multi-image
  blocks, and dimension semantics
- matmul probes were BW-confounded -> loops=16
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

OUT = Path(__file__).resolve().parent.parent / "results" / "mosaic_probes2.json"
RESULTS = {}


def record(name, **kw):
    RESULTS[name] = kw
    OUT.write_text(json.dumps(RESULTS, indent=1))
    print(f"[{name}] {kw}", file=sys.stderr, flush=True)


def run(name, build):
    try:
        fn, feed, meta = build()
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(feed))
        compile_s = time.perf_counter() - t0
        dt = feed_seconds_per_iter(jfn, feed, iters=8, warmup_iters=3)
        record(name, ok=True, seconds=dt, compile_s=round(compile_s, 2), **meta)
        return dt
    except Exception as e:  # noqa: BLE001
        record(name, ok=False, error=f"{type(e).__name__}: {e}"[:400])
        return None


R, L, B = 1152, 128, 1024


def per_image(kernel, out_rows, out_lanes, x, extras=(), imgs_per_block=1):
    n = x.shape[0]
    g = imgs_per_block
    in_specs = [
        pl.BlockSpec((g,) + x.shape[1:], lambda b: (b,) + (0,) * (x.ndim - 1),
                     memory_space=pltpu.VMEM)
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extras]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, out_rows, out_lanes), jnp.float32),
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, out_rows, out_lanes), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, *extras)


def probe_xla_copy():
    def build():
        x = jnp.ones((B, R, L), jnp.float32)
        fn = lambda x: x * 1.0001
        return fn, x, {"traffic_gb": round(2 * B * R * L * 4 / 1e9, 2)}
    return run("xla_copy", build)


def probe_copy_block8():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def build():
        x = jnp.ones((B, R, L), jnp.float32)
        fn = lambda x: per_image(kernel, R, L, x, imgs_per_block=8)
        return fn, x, {"traffic_gb": round(2 * B * R * L * 4 / 1e9, 2)}
    return run("copy_rw_block8", build)


def probe_copy_flat():
    """single huge 2D array, 512-row blocks (plain streaming shape)."""
    rows = B * R // 8  # total/8 lanes widened
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def build():
        x = jnp.ones((rows, L * 8), jnp.float32)
        blk = 2048
        fn = lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, L * 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, L * 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)
        return fn, x, {"traffic_gb": round(2 * rows * L * 8 * 4 / 1e9, 2)}
    return run("copy_rw_flat2d", build)


def probe_unpack_fixed():
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        parts = [x] + [pltpu.roll(x, (L - 32 * j) % L, 1) for j in range(1, 4)]
        o_ref[0] = jnp.stack(parts, axis=1).reshape(4 * R, L)

    def build():
        x = jnp.ones((B, R, L), jnp.float32)
        fn = lambda x: per_image(kernel, 4 * R, L, x)
        return fn, x, {}
    return run("unpack_roll_stack_reshape", build)


def probe_concat6_fixed():
    M = 4 * R - 8

    def kernel(x_ref, o_ref):
        xv = x_ref[0]
        pieces = [xv[i : i + M, :32] for i in range(6)]
        pieces.append(jnp.zeros((M, 64), jnp.float32))
        o_ref[0] = jnp.concatenate(pieces, axis=1)  # (M, 256)

    def build():
        x = jnp.ones((B, 4 * R, L), jnp.float32)
        fn = lambda x: per_image(kernel, M, 256, x)
        return fn, x, {}
    return run("concat6_lane", build)


def probe_ew_narrow_fixed(n_ops, name):
    def kernel(x_ref, o_ref):
        v = x_ref[0][:, :32]
        for _ in range(n_ops):
            v = v * 1.0001 + 0.001
        o_ref[0] = jnp.concatenate([v, jnp.zeros((R, 96), jnp.float32)], axis=1)

    def build():
        x = jnp.ones((B, R, L), jnp.float32)
        fn = lambda x: per_image(kernel, R, L, x)
        return fn, x, {"n_ops": n_ops}
    return run(name, build)


def probe_mm(loops, M, K, N, name, B_=512):
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
        x = jnp.ones((B_, M, K), jnp.bfloat16)
        w = jnp.ones((loops, K, N), jnp.bfloat16)
        fn = lambda x: per_image(kernel, M, N, x, extras=(w,))
        return fn, x, {"exec_slots": B_ * loops * M * K * N, "loops": loops}
    return run(name, build)


def probe_transposed_fixed(loops=8, B_=256):
    C2, N = 64, 4352
    Np = N + 256

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[0]  # (C2, Np)
        taps = [x[:, 128 + d : 128 + d + N]
                for d in (-68, -67, -66, -1, 0, 1, 66, 67, 68)]
        bmat = jnp.concatenate(taps, axis=0)  # (576, N)
        acc = jnp.zeros((128, N), jnp.float32)
        for i in range(loops):
            acc += jax.lax.dot_general(
                w_ref[i], bmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc

    def build():
        x = jnp.ones((B_, C2, Np), jnp.bfloat16)
        w = jnp.ones((loops, 128, 576), jnp.bfloat16)
        fn = lambda x: per_image(kernel, 128, N, x, extras=(w,))
        return fn, x, {"exec_slots": B_ * loops * 128 * 576 * N, "loops": loops}
    return run("mm_transposed_128x576xN", build)


def main():
    d = jax.devices()[0]
    record("device", ok=True, kind=str(getattr(d, "device_kind", "?")),
           platform=str(d.platform))
    probe_xla_copy()
    probe_copy_block8()
    probe_copy_flat()
    probe_unpack_fixed()
    probe_concat6_fixed()
    probe_ew_narrow_fixed(2, "ew2_narrow")
    probe_ew_narrow_fixed(18, "ew18_narrow")
    probe_mm(16, 1216, 256, 256, "mm_pixM_256x256_l16")
    probe_mm(16, 1216, 256, 128, "mm_pixM_256x128_l16")
    probe_mm(16, 1216, 640, 256, "mm_pixM_640x256_l16", B_=256)
    probe_transposed_fixed()
    # derived
    for mm in ("mm_pixM_256x256_l16", "mm_pixM_256x128_l16",
               "mm_pixM_640x256_l16", "mm_transposed_128x576xN"):
        r = RESULTS.get(mm, {})
        if r.get("ok"):
            record(mm + "_rate", ok=True,
                   tmacs=round(r["exec_slots"] / r["seconds"] / 1e12, 1))
    a, b = RESULTS.get("ew2_narrow", {}), RESULTS.get("ew18_narrow", {})
    if a.get("ok") and b.get("ok"):
        per_op = (b["seconds"] - a["seconds"]) / 16
        record("derived_ew_narrow_per_op", ok=True, value=f"{per_op:.3e}",
               useful_elems_per_sec=f"{B * R * 32 / max(per_op, 1e-12):.3e}")


if __name__ == "__main__":
    main()
