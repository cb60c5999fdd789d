"""Flux normalization (reference normalize/normalize.py:3-7).

``normalize_non_linear(x) = tanh(arcsinh(x))`` squashes high-dynamic-range
fluxes into (-1, 1); ``denormalize_non_linear`` is the exact inverse.  Both
are trivially fusible elementwise ops, so they ride along inside whatever jit
region calls them (the deblend forward fuses them into the conv stack's
prologue/epilogue for free).

``denormalize_distribution`` fixes the reference's broken ``normalise=True``
path (deblend_cutout/deblender.py:20-24 coerces the TFP distribution to a
sample before denormalizing, destroying mean/stddev): we instead transform
the distribution's moments through the inverse map — mean via the inverse,
stddev via the delta method (|d sinh(artanh(u))/du| at the mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from debvader_tpu.models.distributions import PixelNormal

__all__ = [
    "normalize_non_linear",
    "denormalize_non_linear",
    "denormalize_distribution",
]


def normalize_non_linear(images: jax.Array) -> jax.Array:
    return jnp.tanh(jnp.arcsinh(images))


def denormalize_non_linear(images_normed: jax.Array) -> jax.Array:
    return jnp.sinh(jnp.arctanh(images_normed))


def denormalize_distribution(dist: PixelNormal) -> PixelNormal:
    """Push a PixelNormal through the denormalization map (delta method)."""
    u = jnp.clip(dist.loc, -1.0 + 1e-7, 1.0 - 1e-7)
    mean = jnp.sinh(jnp.arctanh(u))
    # d/du sinh(artanh(u)) = cosh(artanh(u)) / (1 - u^2)
    jac = jnp.cosh(jnp.arctanh(u)) / (1.0 - jnp.square(u))
    return PixelNormal(mean, dist.scale * jac)
