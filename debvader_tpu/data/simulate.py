"""Synthetic blended-stamp generator for training and benchmarks.

The reference trains on externally-produced DC2/CatSim simulation sets that
are not bundled (training_example.ipynb loads them from disk); without them
``train_deblender`` cannot be exercised end-to-end.  This module provides a
jitted, vmapped generator of (blended, isolated) stamp pairs with the same
tensor contract as those sets:

- a central galaxy with an elliptical Sersic-like profile (Gaussian mixture
  approximation), band-dependent fluxes from a smooth SED slope;
- 0-3 neighbor galaxies offset from center (the blend);
- PSF smoothing per band and Gaussian pixel noise;
- targets are the noiseless isolated central galaxy (stage-1 VAE pairs use
  noisy-isolated -> isolated; stage-2 deblender pairs use blended ->
  isolated), matching the reference's two-stage data semantics
  (training/train.py:78-205).

Everything is generated on device straight into the training batch — no
host IO on the step path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["simulate_batch", "make_dataset"]


def _profile(stamp: int, cy, cx, flux, r50, e1, e2, bands_scale):
    """Elliptical two-Gaussian (crude Sersic) profile, per band."""
    yy = jax.lax.broadcasted_iota(jnp.float32, (stamp, stamp), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (stamp, stamp), 1)
    dy = yy - cy
    dx = xx - cx
    # shear the coordinates by (e1, e2)
    a = 1.0 + e1
    b = 1.0 - e1
    cross = e2
    q1 = a * dx * dx + b * dy * dy + 2.0 * cross * dx * dy
    core = jnp.exp(-q1 / (2.0 * (0.6 * r50) ** 2))
    wings = jnp.exp(-q1 / (2.0 * (1.8 * r50) ** 2))
    prof = 0.7 * core + 0.3 * wings
    prof = prof / jnp.sum(prof)
    return flux * prof[..., None] * bands_scale[None, None, :]


def _psf_blur(img, sigma: float = 1.2, width: int = 7):
    """Separable Gaussian PSF as a depthwise conv (img: (H, W, B))."""
    r = jnp.arange(width, dtype=jnp.float32) - width // 2
    g = jnp.exp(-(r**2) / (2 * sigma**2))
    g = g / g.sum()
    b = img.shape[-1]
    x = img[None]  # (1, H, W, B)
    ky = jnp.tile(g[:, None, None, None], (1, 1, 1, b))  # (w, 1, 1, B)
    kx = jnp.tile(g[None, :, None, None], (1, 1, 1, b))
    for k in (ky, kx):
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b,
        )
    return x[0]


@partial(jax.jit, static_argnames=("n", "stamp", "bands", "max_neighbors"))
def simulate_batch(
    rng: jax.Array,
    n: int,
    stamp: int = 59,
    bands: int = 6,
    max_neighbors: int = 3,
    noise: float = 0.02,
):
    """Returns (blended_noisy, isolated_noisy, isolated_clean), each
    (n, stamp, stamp, bands) float32."""

    def one(key):
        ks = jax.random.split(key, 8)
        c = (stamp - 1) / 2.0
        flux = jax.random.uniform(ks[0], (), minval=5.0, maxval=50.0)
        r50 = jax.random.uniform(ks[1], (), minval=1.5, maxval=4.0)
        e1 = jax.random.uniform(ks[2], (), minval=-0.3, maxval=0.3)
        e2 = jax.random.uniform(ks[3], (), minval=-0.3, maxval=0.3)
        # smooth SED: per-band multipliers from a random slope
        slope = jax.random.uniform(ks[4], (), minval=-0.15, maxval=0.15)
        bscale = jnp.exp(slope * jnp.arange(bands, dtype=jnp.float32))
        bscale = bscale / bscale.mean()
        central = _profile(stamp, c, c, flux, r50, e1, e2, bscale)

        def neighbor(key):
            kk = jax.random.split(key, 7)
            present = jax.random.bernoulli(kk[0], 0.7)
            off = jax.random.uniform(kk[1], (2,), minval=-c * 0.8, maxval=c * 0.8)
            nf = jax.random.uniform(kk[2], (), minval=2.0, maxval=30.0)
            nr = jax.random.uniform(kk[3], (), minval=1.0, maxval=3.5)
            ne1 = jax.random.uniform(kk[4], (), minval=-0.3, maxval=0.3)
            nslope = jax.random.uniform(kk[5], (), minval=-0.15, maxval=0.15)
            nb = jnp.exp(nslope * jnp.arange(bands, dtype=jnp.float32))
            nb = nb / nb.mean()
            img = _profile(stamp, c + off[0], c + off[1], nf, nr, ne1, 0.0, nb)
            return jnp.where(present, img, 0.0)

        neighbors = jax.vmap(neighbor)(
            jax.random.split(ks[5], max_neighbors)
        ).sum(0)

        iso_clean = _psf_blur(central)
        blend_clean = iso_clean + _psf_blur(neighbors)
        eps1 = noise * jax.random.normal(ks[6], blend_clean.shape)
        eps2 = noise * jax.random.normal(ks[7], blend_clean.shape)
        return blend_clean + eps1, iso_clean + eps2, iso_clean

    keys = jax.random.split(rng, n)
    return jax.vmap(one)(keys)


def make_dataset(
    rng: jax.Array,
    n_train: int = 256,
    n_val: int = 64,
    stamp: int = 59,
    bands: int = 6,
    **kw,
):
    """Numpy training/validation pairs for both stages, reference layout:
    stage-1 VAE pairs (noisy isolated -> clean isolated), stage-2 deblender
    pairs (noisy blend -> clean isolated)."""
    import numpy as np

    k1, k2 = jax.random.split(rng)
    btr, itr, ctr = simulate_batch(k1, n_train, stamp, bands, **kw)
    bva, iva, cva = simulate_batch(k2, n_val, stamp, bands, **kw)
    to = lambda x: np.asarray(x, np.float32)
    return {
        "vae": ((to(itr), to(ctr)), (to(iva), to(cva))),
        "deblender": ((to(btr), to(ctr)), (to(bva), to(cva))),
    }
