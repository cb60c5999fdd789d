"""Decisive experiment: sub-pixel recast of the decoder's stride-2 ConvT.

A stride-2 3x3 SAME conv_transpose (in S -> out 2S) is exactly equal to a
dense 2x2 conv at resolution S producing 4*cout channels, followed by
depth-to-space: output phase (py,px) of pixel (2i+py, 2j+px) only ever
reads input pixels {i-1, i} x {j-1, j} (taps with k == o mod 2).  The
packed kernel is 9/16 dense (phases use 4/2/2/1 of the 2x2x... slots), so
the recast pays 16/9 = 1.78x the FLOPs to run the MXU at up to 4x the lane
occupancy -- a projected win exactly where the decoder tail is lane-bound
(cout = 32/64 at 64^2/32^2 spatial; DESIGN.md section 4 measured those
stages at 68-74 TF/s vs 156 TF/s for the 256-channel stages).

This measures conv_transpose vs the packed conv + depth_to_space at every
decoder stride-2 shape, batch 4096 bf16 (the production serving batch),
with the equivalence asserted numerically first.  Methodology as
bench_int8_conv.py: lax.scan-chained iterations inside one jit,
differential (N-1) timing.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = 4096
ITERS = 8


# The packing and depth-to-space come from the production module — the
# benchmark must measure (and equivalence-assert) the shipped code path,
# not a local copy that could drift.
from debvader_tpu.models.layers import (  # noqa: E402
    _depth_to_space as depth_to_space,
    pack_subpixel_kernel,
)


def convt_ref(x, w):
    return lax.conv_transpose(
        x, w, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )


def convt_subpixel(x, wp):
    y = lax.conv_general_dilated(
        x, wp, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return depth_to_space(y)


def convt1_ref(x, w):
    return lax.conv_transpose(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )


def convt1_subpixel(x, wp):
    y = lax.conv_general_dilated(
        x, wp, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return depth_to_space(y)


def check_equivalence():
    from debvader_tpu.models.layers import pack_subpixel_kernel_s1

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)), jnp.float32)
    w = rng.normal(size=(3, 3, 7, 5)).astype(np.float32)
    ref = convt_ref(x, jnp.asarray(w))
    sub = convt_subpixel(x, pack_subpixel_kernel(w))
    err = float(jnp.max(jnp.abs(ref - sub)))
    print(f"s2 equivalence max|diff| = {err:.2e}", flush=True)
    assert err < 1e-5, err
    ref1 = convt1_ref(x, jnp.asarray(w))
    sub1 = convt1_subpixel(x, pack_subpixel_kernel_s1(jnp.asarray(w)))
    err1 = float(jnp.max(jnp.abs(ref1 - sub1)))
    print(f"s1 equivalence max|diff| = {err1:.2e}", flush=True)
    assert err1 < 1e-5, err1


@partial(jax.jit, static_argnames=("mode", "n"))
def chain(x, w, mode, n):
    s, cin = x.shape[1], x.shape[3]

    def feedback(y):
        y = y[:, :s, :s, :]
        reps = -(-cin // y.shape[3])
        if reps > 1:
            y = jnp.tile(y, (1, 1, 1, reps))
        return (y[..., :cin] * jnp.bfloat16(2**-6)).astype(x.dtype)

    op = {
        "ref": convt_ref,
        "sub": convt_subpixel,
        "ref1": convt1_ref,
        "sub1": convt1_subpixel,
    }[mode]

    def body(xx, _):
        return feedback(op(xx, w)), None

    out, _ = lax.scan(body, x, None, length=n)
    return jnp.sum(out.astype(jnp.float32))


def timeit(x, w, mode):
    def run(n):
        t0 = time.perf_counter()
        float(chain(x, w, mode, n))
        return time.perf_counter() - t0

    run(1), run(ITERS + 1)
    run(1)
    d1 = min(run(1), run(1))
    dn = min(run(ITERS + 1), run(ITERS + 1))
    return (dn - d1) / ITERS


def bench_full_model():
    """End-to-end sampled-latent VAE forward, decoder_subpixel off vs on.

    Same methodology as bench.py (data-dependency chained iterations,
    differential timing); this is the number that decides whether the
    recast becomes the serving default.
    """
    from debvader_tpu.config import ModelConfig
    from debvader_tpu.models.vae import DeblenderVAE, init_vae

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, 59, 59, 6)), jnp.float32
    )
    results = {}
    for name, sub in (("convT", False), ("subpixel", True)):
        model = DeblenderVAE(ModelConfig(dtype="bfloat16", decoder_subpixel=sub))
        variables = init_vae(model, jax.random.PRNGKey(0))

        @jax.jit
        def fwd(variables, xx, rng, model=model):
            dist, _ = model.apply(variables, xx, rng=rng)
            return dist.loc

        rng = jax.random.PRNGKey(1)

        def run(n):
            t0 = time.perf_counter()
            y = x
            for i in range(n):
                y = fwd(variables, y, jax.random.fold_in(rng, i))
            float(jnp.sum(y))
            return time.perf_counter() - t0

        run(1), run(ITERS + 1)
        d1 = min(run(1), run(1))
        dn = min(run(ITERS + 1), run(ITERS + 1))
        dt = (dn - d1) / ITERS
        results[name] = dt
        print(
            f"full VAE fwd [{name}]: {dt * 1e3:7.2f} ms/iter "
            f"({BATCH / dt:,.0f} stamps/s)",
            flush=True,
        )
    print(
        f"end-to-end speedup {results['convT'] / results['subpixel']:.3f}x",
        flush=True,
    )


def main():
    check_equivalence()
    from debvader_tpu.models.layers import pack_subpixel_kernel_s1

    shapes = [
        ("decT s2 4x4x256->8x8x256", (4, 256, 256, 2)),
        ("decT s2 8x8x256->16x16x128", (8, 256, 128, 2)),
        ("decT s2 16x16x128->32x32x64", (16, 128, 64, 2)),
        ("decT s2 32x32x64->64x64x32", (32, 64, 32, 2)),
        ("decT s1 8x8x256->8x8x256", (8, 256, 256, 1)),
        ("decT s1 16x16x128->16x16x128", (16, 128, 128, 1)),
        ("decT s1 32x32x64->32x32x64", (32, 64, 64, 1)),
        ("decT s1 64x64x32->64x64x32", (64, 32, 32, 1)),
    ]
    print(f"backend={jax.default_backend()} batch={BATCH}", flush=True)
    for i, (name, (s, cin, cout, stride)) in enumerate(shapes):
        # Useful MACs: s^2 * 9 * cin * cout for both strides (stride 2:
        # each of s^2 inputs feeds 9 taps; stride 1: each of s^2 outputs
        # sums 9 taps).
        flops = 2 * BATCH * s * s * 9 * cin * cout
        k = jax.random.PRNGKey(i)
        xb = jax.random.normal(k, (BATCH, s, s, cin), jnp.bfloat16)
        wnp = np.random.default_rng(i).normal(size=(3, 3, cout, cin))
        wb = jnp.asarray(wnp, jnp.bfloat16)
        if stride == 2:
            wp = pack_subpixel_kernel(wnp.astype(np.float32)).astype(jnp.bfloat16)
            tr = timeit(xb, wb, "ref")
            ts = timeit(xb, wp, "sub")
        else:
            wp = pack_subpixel_kernel_s1(
                jnp.asarray(wnp, jnp.float32)
            ).astype(jnp.bfloat16)
            tr = timeit(xb, wb, "ref1")
            ts = timeit(xb, wp, "sub1")
        print(
            f"{name}: convT {tr * 1e3:6.2f} ms ({flops / tr / 1e12:6.1f} TF/s)  "
            f"subpixel {ts * 1e3:6.2f} ms ({flops / ts / 1e12:6.1f} TF/s useful)  "
            f"speedup {tr / ts:4.2f}x",
            flush=True,
        )
    bench_full_model()


if __name__ == "__main__":
    main()
