#!/usr/bin/env python
"""Latent-space analysis, mirroring the reference notebook
notebooks/behavior_of_latent_space.ipynb:

- load a deblender (or random-init when no weights are available),
- deblend the bundled DC2 stamps,
- aleatoric map = dist.stddev(), sampling mean over 100 draws,
- per-dimension latent posterior mean/stddev analysis.

Run: python examples/behavior_of_latent_space.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

import debvader_tpu as dt
from debvader_tpu.api import deblend_samples

STAMPS = "/root/reference/src/debvader/data/dc2_imgs/imgs_dc2.npy"


def main():
    stamps = np.load(STAMPS).astype(np.float32)
    print(f"stamps: {stamps.shape}")

    try:
        model, variables = dt.load_deblender("dc2")
        print("loaded dc2 weights")
    except FileNotFoundError:
        print("no dc2 weights in this snapshot; using random init")
        model = dt.create_model_vae(dt.ModelConfig())
        variables = dt.init_vae(model, jax.random.PRNGKey(0))
    net = (model, variables)

    # notebook cell 11: mean + aleatoric stddev
    means, dist = dt.deblend(net, stamps)
    aleatoric = np.asarray(dist.stddev())
    print(f"mean flux per stamp: {means.sum(axis=(1, 2, 3))}")
    print(f"aleatoric stddev (r band, center px): {aleatoric[:, 29, 29, 2]}")

    # notebook cell 23: dist.sample(100).mean() equivalent
    samples = deblend_samples(net, stamps, n_samples=100)
    sample_mean = np.asarray(samples).mean(0)
    print(f"sampling-mean vs mean max diff: {np.abs(sample_mean - means).max():.4f}")

    # notebook cells 15-21: latent posterior per-dim analysis
    posterior = model.apply(
        variables, stamps, method=lambda m, x: m.encode(x)
    )
    z_mean = np.asarray(posterior.mean())
    z_std = np.asarray(posterior.stddev())
    print(f"latent mean per-dim (first stamp): {z_mean[0][:8]}")
    print(f"latent stddev per-dim (first stamp): {z_std[0][:8]}")
    active = (z_std.mean(0) < 0.9).sum()
    print(f"active latent dimensions (stddev < 0.9): {active}/32")


if __name__ == "__main__":
    main()
