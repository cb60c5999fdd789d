"""Decisive experiment for an int8 serving mode: does XLA/TPU hit int8 MXU
rates (2x bf16 peak on v5e) on THIS model's conv shapes, or does it upcast?

Times bf16 vs s8xs8->s32 convs at the deblender's decoder/encoder stages
(including the stride-2 transposed convs that carry 2/3 of decoder time),
batch 4096 (the production serving batch).

Methodology: per-call dispatch through this environment's device tunnel
costs more than many of these convs, so the iteration loop lives INSIDE
one jit as a lax.scan whose carry feeds each conv's output back into the
next conv's input (sliced/tiled to shape) — a real data dependency, so
nothing can be elided, reordered, or overlapped, and one host dispatch
covers all N iterations.  Reported time is the (N iters - 1 iter)
differential of two such calls, which cancels the remaining dispatch and
fetch constants.  Prints achieved TF/s per shape on useful FLOPs.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = 4096
ITERS = 8


def _conv_op(x, w, dtype, transpose):
    kwargs = dict(preferred_element_type=jnp.int32) if dtype == "int8" else {}
    if transpose:
        # the decoder's stride-2 ConvTranspose2DTF lowering (TF kernel
        # layout (kh,kw,out,in) == forward HWIO under transpose_kernel)
        return lax.conv_transpose(
            x, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True, **kwargs,
        )
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs,
    )


@partial(jax.jit, static_argnames=("dtype", "transpose", "n"))
def conv_chain(x, w, dtype, transpose, n):
    """n chained convs in one program: each output is renormalized back to
    the input's shape/dtype and fed to the next conv, so the convs are
    sequentially dependent and none can be dead-code-eliminated."""
    s, cin = x.shape[1], x.shape[3]

    def feedback(y):
        # slice spatial (convT doubles it), tile channels up to cin
        y = y[:, :s, :s, :]
        reps = -(-cin // y.shape[3])
        if reps > 1:
            y = jnp.tile(y, (1, 1, 1, reps))
        y = y[..., :cin]
        if dtype == "int8":
            # keep values live without overflow patterns XLA can fold
            return lax.shift_right_arithmetic(y, 8).astype(jnp.int8)
        return (y * jnp.bfloat16(2**-6)).astype(x.dtype)

    def body(xx, _):
        return feedback(_conv_op(xx, w, dtype, transpose)), None

    out, _ = lax.scan(body, x, None, length=n)
    return jnp.sum(out.astype(jnp.float32))


def timeit(x, w, dtype, transpose):
    def run(n):
        t0 = time.perf_counter()
        float(conv_chain(x, w, dtype, transpose, n))
        return time.perf_counter() - t0

    run(1), run(ITERS + 1)  # compile both programs
    run(1)  # warm
    d1 = min(run(1), run(1))
    dn = min(run(ITERS + 1), run(ITERS + 1))
    return (dn - d1) / ITERS


def main():
    # (name, (in_spatial, cin, cout, transpose)).  Useful FLOPs for both
    # the stride-1 conv and the stride-2 convT are 2*B*S^2*9*cin*cout
    # (each input pixel contributes all 9 taps).
    shapes = [
        ("enc 59x59x6->32", (59, 6, 32, False)),
        ("dec 8x8x256->256", (8, 256, 256, False)),
        ("dec 16x16x128->128", (16, 128, 128, False)),
        ("dec 32x32x64->64", (32, 64, 64, False)),
        ("dec 64x64x32->32", (64, 32, 32, False)),
        ("decT s2 4x4x256->8x8x256", (4, 256, 256, True)),
        ("decT s2 8x8x256->16x16x128", (8, 256, 128, True)),
        ("decT s2 16x16x128->32x32x64", (16, 128, 64, True)),
        ("decT s2 32x32x64->64x64x32", (32, 64, 32, True)),
    ]
    print(f"backend={jax.default_backend()} batch={BATCH}", flush=True)
    for i, (name, (s, cin, cout, tr)) in enumerate(shapes):
        flops = 2 * BATCH * s * s * 9 * cin * cout
        # generate on device: a host upload of these arrays through the
        # axon tunnel costs minutes and is not what we're measuring
        k = jax.random.PRNGKey(i)
        kshape = (3, 3, cout, cin) if tr else (3, 3, cin, cout)
        xb = jax.random.normal(k, (BATCH, s, s, cin), jnp.bfloat16)
        wb = jax.random.normal(k, kshape, jnp.bfloat16)
        xi = jax.random.randint(k, (BATCH, s, s, cin), -127, 128, jnp.int8)
        wi = jax.random.randint(k, kshape, -127, 128, jnp.int8)
        tb = timeit(xb, wb, "bf16", tr)
        ti = timeit(xi, wi, "int8", tr)
        print(
            f"{name}: bf16 {tb * 1e3:6.2f} ms ({flops / tb / 1e12:6.1f} TF/s)  "
            f"int8 {ti * 1e3:6.2f} ms ({flops / ti / 1e12:6.1f} TOP/s)  "
            f"speedup {tb / ti:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
