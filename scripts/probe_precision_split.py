"""Attribution probe: which half of the network carries the HIGH-precision
(3-pass bf16x3) residual error?

scripts/bench_precision.py measured fp32+HIGH at max flux rel err 1.85e-4
— just over the 1e-4 clause — and fp32+HIGHEST at 1.1e-6 but 1.8x slower.
If the HIGH error concentrates in one half, a split mode (that half at
HIGHEST, the rest at HIGH) could be a materially faster compliant mode
(~47k est. if the decoder tolerates HIGH).  This probe composes
encode/decode from differently-configured models over the same variables,
so no new config surface is needed to measure it.

Usage: python scripts/probe_precision_split.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.config import ModelConfig
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.training.checkpoint import load_deblender

    _, variables = load_deblender("sim_demo")
    test_np = np.asarray(simulate_batch(jax.random.PRNGKey(7), 256)[0], np.float32)

    models = {
        p: DeblenderVAE(ModelConfig(matmul_precision=p))
        for p in ("high", "highest")
    }

    def fwd(enc_p, dec_p):
        @jax.jit
        def f(images):
            post = models[enc_p].apply(
                variables, images, method=lambda m, v: m.encode(v)
            )
            dist = models[dec_p].apply(
                variables, post.mean(), method=lambda m, z: m.decode(z)
            )
            return dist.loc

        return f

    # Ground truth: exact fp32 on CPU.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = DeblenderVAE(ModelConfig())
        cpu_vars = jax.device_put(
            jax.tree_util.tree_map(np.asarray, variables), cpu
        )
        ref = np.asarray(
            jax.jit(
                lambda v, im: model.apply(v, im, z_mode="mean")[0].loc
            )(cpu_vars, jax.device_put(test_np, cpu)),
            np.float64,
        )
    tr = ref.sum(axis=(1, 2, 3))

    test = jnp.asarray(test_np)
    for enc_p, dec_p in (
        ("high", "high"),
        ("highest", "high"),
        ("high", "highest"),
        ("highest", "highest"),
    ):
        loc = np.asarray(fwd(enc_p, dec_p)(test), np.float64)
        tot = loc.sum(axis=(1, 2, 3))
        rel = np.abs(tot - tr) / np.maximum(np.abs(tr), 1e-9)
        print(
            f"enc={enc_p:>7} dec={dec_p:>7}: flux err mean {rel.mean():.2e} "
            f"max {rel.max():.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
