"""Probability primitives for the deblending VAE, in pure JAX.

These replace the TFP machinery the reference uses:

- ``fill_triangular`` / ``fill_triangular_inverse``: pack/unpack a lower
  triangular matrix from a flat vector using TFP's exact element ordering
  (reference: tensorflow_probability.python.math.fill_triangular, used at
  /root/reference/src/debvader/model/model.py:7,50).
- ``MultivariateNormalTriL``: the 32-dim latent posterior
  (reference: model/model.py:211-214 via tfp.layers.MultivariateNormalTriL,
  and the hand-rolled ONNX sampler at model/model.py:43-58).
- ``PixelNormal``: the per-pixel independent Normal decoder head
  (reference: model/model.py:154-159).
- analytic and single-sample Monte-Carlo KL to a standard-normal prior
  (reference: tfp.layers.KLDivergenceRegularizer at model/model.py:211-214;
  TFP's default there is the MC estimate at a sampled point, so both are
  provided — ``kl_mode='analytic'`` is our default, ``'mc'`` reproduces the
  reference estimator).

Everything is a plain pytree of arrays, so the distributions flow through
``jit`` / ``vmap`` / ``shard_map`` without host sync.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "tril_size",
    "fill_triangular",
    "fill_triangular_inverse",
    "softplus_tril",
    "MultivariateNormalTriL",
    "PixelNormal",
    "mvn_params_size",
    "kl_mvn_tril_standard_normal",
]

_LOG_2PI = math.log(2.0 * math.pi)


def tril_size(n: int) -> int:
    """Number of elements in an n x n lower-triangular matrix."""
    return n * (n + 1) // 2


def mvn_params_size(latent_dim: int) -> int:
    """Size of the flat parameter vector for an MVN-TriL head.

    Matches ``tfp.layers.MultivariateNormalTriL.params_size(latent_dim)``
    (reference model/model.py:97,114): ``latent_dim`` locs plus the packed
    lower triangle.
    """
    return latent_dim + tril_size(latent_dim)


def _fill_triangular_perm(n: int) -> np.ndarray:
    """Static gather indices implementing TFP's fill_triangular packing.

    TFP packs a length-m vector x (m = n(n+1)/2) into tril(reshape(
    concat([x[n:], x[::-1]]), (n, n))).  We precompute, for every (row, col)
    of the lower triangle in row-major order, which element of x lands there,
    so both directions become a single static gather.
    """
    m = tril_size(n)
    x = np.arange(m)
    xc = np.concatenate([x[n:], x[::-1]])
    mat = xc.reshape(n, n)
    rows, cols = np.tril_indices(n)
    return mat[rows, cols]  # shape (m,): source index in x for each tril slot


def _fill_triangular_gather(n: int) -> np.ndarray:
    """Flat gather indices (n*n,) into x extended with one trailing zero:
    position (i, j) reads x[perm] on the lower triangle and the zero slot
    above it.  A single static gather is much cheaper on TPU than the
    scatter formulation (no scatter unit; XLA serializes scatters)."""
    m = tril_size(n)
    perm = _fill_triangular_perm(n)
    idx = np.full((n, n), m, dtype=np.int32)  # m = index of appended zero
    rows, cols = np.tril_indices(n)
    idx[rows, cols] = perm
    return idx.reshape(-1)


def fill_triangular(x: jax.Array, n: int | None = None) -> jax.Array:
    """Pack a (..., n(n+1)/2) vector into a (..., n, n) lower-tri matrix.

    Element ordering matches TFP's ``fill_triangular`` exactly, e.g. for
    n=3: [1,2,3,4,5,6] -> [[4,0,0],[6,5,0],[3,2,1]].
    """
    m = x.shape[-1]
    if n is None:
        n = int((math.isqrt(8 * m + 1) - 1) // 2)
    if tril_size(n) != m:
        raise ValueError(f"last dim {m} is not a triangular number for n={n}")
    gather = jnp.asarray(_fill_triangular_gather(n))
    x_ext = jnp.concatenate([x, jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1)
    return x_ext[..., gather].reshape(x.shape[:-1] + (n, n))


def fill_triangular_inverse(mat: jax.Array) -> jax.Array:
    """Inverse of :func:`fill_triangular` (used by the weight exporter)."""
    n = mat.shape[-1]
    perm = _fill_triangular_perm(n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    rows, cols = np.tril_indices(n)
    flat = mat[..., rows, cols]
    return flat[..., inv]


def softplus_tril(params: jax.Array, latent_dim: int, diag_shift: float = 1e-5):
    """(loc, scale_tril) from a flat MVN head output.

    Reproduces the reference's TriL construction: ``fill_triangular`` on the
    tail, then ``softplus(diag) + 1e-5`` on the diagonal
    (reference model/model.py:49-52; tfp.layers.MultivariateNormalTriL uses
    the same FillScaleTriL with diag_shift=1e-5).
    """
    loc = params[..., :latent_dim]
    tril = fill_triangular(params[..., latent_dim:], latent_dim)
    diag = jax.nn.softplus(jnp.diagonal(tril, axis1=-2, axis2=-1)) + diag_shift
    n = latent_dim
    eye = jnp.eye(n, dtype=tril.dtype)
    tril = tril * (1.0 - eye) + diag[..., None] * eye * jnp.ones_like(tril)
    # The line above writes diag into the diagonal without a scatter:
    # off-diagonal kept, diagonal replaced.
    return loc, tril


class MultivariateNormalTriL(NamedTuple):
    """Latent posterior q(z|x): N(loc, L L^T) with lower-triangular L."""

    loc: jax.Array  # (..., n)
    scale_tril: jax.Array  # (..., n, n)

    @property
    def event_dim(self) -> int:
        return self.loc.shape[-1]

    def sample(self, rng: jax.Array, sample_shape: tuple = ()) -> jax.Array:
        shape = sample_shape + self.loc.shape
        eps = jax.random.normal(rng, shape, dtype=self.loc.dtype)
        # HIGHEST unconditionally: this (n, 32, 32) contraction is negligible
        # next to the conv stacks, and pinning it keeps the z_mode='sample'
        # path at full fp32 fidelity under every ModelConfig.matmul_precision
        # setting (the knob governs the conv/dense stacks; without this the
        # TPU default would bf16-round the one matmul the knob can't reach).
        return self.loc + jnp.einsum(
            "...ij,...j->...i",
            self.scale_tril,
            eps,
            precision=jax.lax.Precision.HIGHEST,
        )

    def mean(self) -> jax.Array:
        return self.loc

    def stddev(self) -> jax.Array:
        """Marginal per-dimension standard deviation: sqrt(diag(L L^T))."""
        return jnp.sqrt(jnp.sum(jnp.square(self.scale_tril), axis=-1))

    def log_prob(self, z: jax.Array) -> jax.Array:
        n = self.event_dim
        diff = z - self.loc
        batch = jnp.broadcast_shapes(diff.shape[:-1], self.scale_tril.shape[:-2])
        tril = jnp.broadcast_to(self.scale_tril, batch + (n, n))
        diff = jnp.broadcast_to(diff, batch + (n,))
        sol = jax.scipy.linalg.solve_triangular(
            tril, diff[..., None], lower=True
        )[..., 0]
        half_log_det = jnp.sum(
            jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), axis=-1
        )
        return -0.5 * jnp.sum(jnp.square(sol), axis=-1) - half_log_det - 0.5 * n * _LOG_2PI

    def kl_to_standard_normal(self) -> jax.Array:
        return kl_mvn_tril_standard_normal(self.loc, self.scale_tril)


def kl_mvn_tril_standard_normal(loc: jax.Array, scale_tril: jax.Array) -> jax.Array:
    """Analytic KL( N(loc, LL^T) || N(0, I) ), batched over leading dims.

    KL = 0.5 * (tr(LL^T) + ||loc||^2 - n) - sum(log diag L).
    """
    n = loc.shape[-1]
    tr = jnp.sum(jnp.square(scale_tril), axis=(-2, -1))
    sq = jnp.sum(jnp.square(loc), axis=-1)
    log_det = jnp.sum(jnp.log(jnp.diagonal(scale_tril, axis1=-2, axis2=-1)), axis=-1)
    return 0.5 * (tr + sq - n) - log_det


class PixelNormal(NamedTuple):
    """Per-pixel independent Normal decoder head.

    Mirrors the reference's DistributionLambda head
    (model/model.py:154-159): ``loc`` and ``scale`` both shaped
    (..., H, W, bands); the 1e-4 scale floor is applied by the decoder
    before constructing this object.
    """

    loc: jax.Array
    scale: jax.Array

    def mean(self) -> jax.Array:
        return self.loc

    def stddev(self) -> jax.Array:
        return self.scale

    def sample(self, rng: jax.Array, sample_shape: tuple = ()) -> jax.Array:
        shape = sample_shape + self.loc.shape
        eps = jax.random.normal(rng, shape, dtype=self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, x: jax.Array) -> jax.Array:
        z = (x - self.loc) / self.scale
        return -0.5 * jnp.square(z) - jnp.log(self.scale) - 0.5 * _LOG_2PI
