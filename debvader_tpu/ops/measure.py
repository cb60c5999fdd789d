"""Photometry and shape measurement on deblended stamps.

The reference reserves an empty ``measure/`` package for this
(measure/__init__.py, 0 lines — SURVEY.md §2 row 17); the deblending paper
(Arcelin et al. 2020) evaluates flux and ellipticity recovery, so those are
the measurements a user of the framework needs.  All measurements are
vmapped, jitted reductions over stamp batches — one device pass for an
entire field's worth of deblended galaxies:

- ``flux``: per-band aperture (or full-stamp) sums
- ``centroid``: flux-weighted first moments
- ``second_moments`` / ``ellipticity``: adaptive unweighted quadrupole
  moments and the (e1, e2) distortion derived from them
- ``snr``: flux over noise from the per-pixel aleatoric stddev
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["flux", "centroid", "second_moments", "ellipticity", "snr", "measure_batch"]


def _grids(s: int):
    yy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    return yy, xx


def flux(stamps: jax.Array, radius: float | None = None) -> jax.Array:
    """(N, S, S, B) -> (N, B) total flux; optional circular aperture around
    the stamp center."""
    if radius is None:
        return jnp.sum(stamps, axis=(1, 2))
    s = stamps.shape[1]
    yy, xx = _grids(s)
    c = (s - 1) / 2.0
    ap = ((yy - c) ** 2 + (xx - c) ** 2 <= radius**2).astype(stamps.dtype)
    return jnp.einsum("nijb,ij->nb", stamps, ap)


def centroid(stamps: jax.Array) -> jax.Array:
    """(N, S, S, B) -> (N, B, 2) flux-weighted centroids (y, x)."""
    s = stamps.shape[1]
    yy, xx = _grids(s)
    w = jnp.clip(stamps, 0.0, None)
    tot = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1e-20)
    cy = jnp.einsum("nijb,ij->nb", w, yy) / tot
    cx = jnp.einsum("nijb,ij->nb", w, xx) / tot
    return jnp.stack([cy, cx], axis=-1)


def second_moments(stamps: jax.Array) -> jax.Array:
    """(N, S, S, B) -> (N, B, 3): (Qyy, Qxx, Qyx) about the centroid."""
    s = stamps.shape[1]
    yy, xx = _grids(s)
    w = jnp.clip(stamps, 0.0, None)
    tot = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1e-20)
    c = centroid(stamps)  # (N, B, 2)
    cy = c[..., 0][:, None, None, :]  # (N, 1, 1, B)
    cx = c[..., 1][:, None, None, :]
    dy = yy[None, :, :, None] - cy
    dx = xx[None, :, :, None] - cx
    qyy = jnp.sum(w * dy * dy, axis=(1, 2)) / tot
    qxx = jnp.sum(w * dx * dx, axis=(1, 2)) / tot
    qyx = jnp.sum(w * dy * dx, axis=(1, 2)) / tot
    return jnp.stack([qyy, qxx, qyx], axis=-1)


def ellipticity(stamps: jax.Array) -> jax.Array:
    """(N, S, S, B) -> (N, B, 2): distortion (e1, e2) from quadrupole
    moments: e1 = (Qxx - Qyy) / (Qxx + Qyy), e2 = 2 Qyx / (Qxx + Qyy)."""
    q = second_moments(stamps)
    qyy, qxx, qyx = q[..., 0], q[..., 1], q[..., 2]
    denom = jnp.maximum(qxx + qyy, 1e-20)
    return jnp.stack([(qxx - qyy) / denom, 2.0 * qyx / denom], axis=-1)


def snr(mean_stamps: jax.Array, stddev_stamps: jax.Array) -> jax.Array:
    """(N, S, S, B) x2 -> (N, B): flux over root-sum-square aleatoric
    noise."""
    f = jnp.sum(mean_stamps, axis=(1, 2))
    n = jnp.sqrt(jnp.sum(jnp.square(stddev_stamps), axis=(1, 2)))
    return f / jnp.maximum(n, 1e-20)


@jax.jit
def measure_batch(mean_stamps: jax.Array, stddev_stamps: jax.Array | None = None):
    """All measurements for a batch of deblended stamps in one jit."""
    out = {
        "flux": flux(mean_stamps),
        "centroid": centroid(mean_stamps),
        "second_moments": second_moments(mean_stamps),
        "ellipticity": ellipticity(mean_stamps),
    }
    if stddev_stamps is not None:
        out["snr"] = snr(mean_stamps, stddev_stamps)
    return out
