"""Isolate the render_field scatter scan on hardware and compare scan-body
granularities.

The production renderer (ops/shift.py render_field) places each shifted
stamp with one dynamic_update_slice per lax.scan step — a strictly
sequential chain over sources.  If the per-step cost is fixed overhead
(scan bookkeeping / DUS dispatch) rather than the ~90 KB patch
read-modify-write, grouping G sources per scan step (same DUS chain, G per
body) should cut wall time ~G-fold until bandwidth takes over.

Timing uses bench.py's differential data-dependency-chain methodology (the
environment's runtime can ack block_until_ready early).

Usage: python scripts/bench_render.py [field_size] [n_src]
"""

from __future__ import annotations

import sys

from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from debvader_tpu.ops.shift import render_field, subpixel_shift_const
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def make_grouped_renderer(field_size, group, s, b, chunk=4096):
    """render_field's order-1 path with G sources folded into each scan step."""
    pos0 = (field_size - s) // 2
    interp_pad = 1
    pad_s = s + 2 * interp_pad
    pad = pad_s
    canvas_size = field_size + 2 * pad
    chunk = group * ((chunk + group - 1) // group)

    def scatter_group(canvas, inputs):
        shifted, ioff, m = inputs  # (G, ps, ps, b), (G, 2), (G,)
        for g in range(group):
            yu = pos0 + ioff[g, 0] - interp_pad + pad
            xu = pos0 + ioff[g, 1] - interp_pad + pad
            y = jnp.clip(yu, 0, canvas_size - pad_s)
            x = jnp.clip(xu, 0, canvas_size - pad_s)
            visible = m[g] & (yu == y) & (xu == x)
            sh = jnp.where(visible, shifted[g], 0.0)
            patch = jax.lax.dynamic_slice(canvas, (y, x, 0), (pad_s, pad_s, b))
            canvas = jax.lax.dynamic_update_slice(canvas, patch + sh, (y, x, 0))
        return canvas, None

    def shift_one(stamp, f):
        sp = jnp.pad(
            stamp, ((interp_pad, interp_pad), (interp_pad, interp_pad), (0, 0))
        )
        return subpixel_shift_const(sp, f)

    @jax.jit
    def run(stamps, offsets):
        n = stamps.shape[0]
        mask = jnp.ones((n,), bool)
        n_pad = (-n) % chunk
        if n_pad:
            stamps = jnp.concatenate(
                [stamps, jnp.zeros((n_pad, s, s, b), stamps.dtype)]
            )
            offsets = jnp.concatenate(
                [offsets, jnp.zeros((n_pad, 2), offsets.dtype)]
            )
            mask = jnp.concatenate([mask, jnp.zeros((n_pad,), bool)])
        int_off = jnp.floor(offsets).astype(jnp.int32)
        frac = (offsets - int_off).astype(jnp.float32)
        canvas = jnp.zeros((canvas_size, canvas_size, b), stamps.dtype)
        for c0 in range(0, stamps.shape[0], chunk):
            sl = slice(c0, c0 + chunk)
            shifted = jax.vmap(shift_one)(stamps[sl], frac[sl])
            shifted = shifted.reshape(-1, group, pad_s, pad_s, b)
            io = int_off[sl].reshape(-1, group, 2)
            mk = mask[sl].reshape(-1, group)
            canvas, _ = jax.lax.scan(scatter_group, canvas, (shifted, io, mk))
        return canvas[pad : pad + field_size, pad : pad + field_size, :]

    return run


def time_render(fn, stamps, offsets, iters=3):
    """Differential chained timing (debvader_tpu.utils.timing): each
    iteration perturbs the stamps from the previous canvas so runs cannot
    be elided."""
    from debvader_tpu.utils.timing import feed_seconds_per_iter

    return feed_seconds_per_iter(
        lambda st: fn(st, offsets), stamps, iters=iters
    )


def main():
    field_size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    s, b = 59, 6
    print(f"backend={jax.default_backend()} field={field_size} n_src={n}", flush=True)
    rng = np.random.default_rng(0)
    stamps = jnp.asarray(rng.normal(size=(n, s, s, b)).astype(np.float32))
    half = field_size // 2 - s
    offsets = jnp.asarray(rng.uniform(-half, half, size=(n, 2)).astype(np.float32))
    jax.block_until_ready((stamps, offsets))

    base_fn = lambda st, off: render_field(st, off, field_size)
    t_base = time_render(base_fn, stamps, offsets)
    ref = np.asarray(render_field(stamps, offsets, field_size))
    print(
        f"baseline render_field   {t_base*1e3:9.1f} ms  ({t_base/n*1e6:6.1f} us/src)",
        flush=True,
    )
    for group in (2, 4, 8, 16, 32):
        fn = make_grouped_renderer(field_size, group, s, b)
        t_g = time_render(fn, stamps, offsets)
        out = np.asarray(fn(stamps, offsets))
        err = float(np.max(np.abs(out - ref)))
        print(
            f"grouped scan G={group:<3d}     {t_g*1e3:9.1f} ms"
            f"  ({t_g/n*1e6:6.1f} us/src)  speedup {t_base/t_g:5.2f}x"
            f"  max|diff| {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
