"""Golden tests for the probability primitives against hand math / scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from debvader_tpu.models.distributions import (
    MultivariateNormalTriL,
    PixelNormal,
    fill_triangular,
    fill_triangular_inverse,
    kl_mvn_tril_standard_normal,
    mvn_params_size,
    softplus_tril,
    tril_size,
)


def test_params_size():
    # tfp.layers.MultivariateNormalTriL.params_size(32) == 560
    assert mvn_params_size(32) == 560
    assert tril_size(32) == 528


def test_fill_triangular_matches_tfp_ordering():
    # TFP documented example: [1..6] -> [[4,0,0],[6,5,0],[3,2,1]]
    x = jnp.arange(1.0, 7.0)
    expected = np.array([[4.0, 0, 0], [6, 5, 0], [3, 2, 1]])
    np.testing.assert_array_equal(np.asarray(fill_triangular(x)), expected)


@pytest.mark.parametrize("n", [2, 3, 5, 32])
def test_fill_triangular_roundtrip(n):
    m = tril_size(n)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, m)))
    mat = fill_triangular(x)
    assert mat.shape == (4, n, n)
    # strictly upper part is zero
    np.testing.assert_array_equal(
        np.asarray(mat) * np.triu(np.ones((n, n)), 1), np.zeros((4, n, n))
    )
    back = fill_triangular_inverse(mat)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_softplus_tril_diag():
    n = 4
    params = jnp.asarray(np.random.default_rng(1).normal(size=(mvn_params_size(n),)))
    loc, tril = softplus_tril(params, n, diag_shift=1e-5)
    raw = fill_triangular(params[n:])
    d = np.diagonal(np.asarray(tril))
    expected = np.log1p(np.exp(np.asarray(np.diagonal(np.asarray(raw))))) + 1e-5
    np.testing.assert_allclose(d, expected, rtol=1e-4)
    assert (d > 0).all()
    # off-diagonals untouched
    off = np.asarray(tril) - np.diag(d)
    off_raw = np.asarray(raw) - np.diag(np.diagonal(np.asarray(raw)))
    np.testing.assert_allclose(off, off_raw, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(loc), np.asarray(params[:n]))


def test_mvn_log_prob_vs_scipy():
    rng = np.random.default_rng(2)
    n = 5
    loc = rng.normal(size=(n,))
    a = rng.normal(size=(n, n)) * 0.3
    tril = np.tril(a) + np.eye(n)  # well conditioned
    cov = tril @ tril.T
    dist = MultivariateNormalTriL(jnp.asarray(loc), jnp.asarray(tril))
    z = rng.normal(size=(7, n))
    got = np.asarray(dist.log_prob(jnp.asarray(z)))
    want = stats.multivariate_normal(mean=loc, cov=cov).logpdf(z)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dist.stddev()), np.sqrt(np.diag(cov)), rtol=1e-6
    )


def test_mvn_sample_moments():
    rng = np.random.default_rng(3)
    n = 3
    loc = rng.normal(size=(n,))
    tril = np.tril(rng.normal(size=(n, n)) * 0.5) + np.eye(n)
    dist = MultivariateNormalTriL(jnp.asarray(loc), jnp.asarray(tril))
    samples = dist.sample(jax.random.PRNGKey(0), (200_000,))
    emp_mean = np.asarray(samples).mean(0)
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_mean, loc, atol=0.02)
    np.testing.assert_allclose(emp_cov, tril @ tril.T, atol=0.03)


def test_kl_standard_normal_analytic_vs_mc():
    rng = np.random.default_rng(4)
    n = 6
    loc = jnp.asarray(rng.normal(size=(2, n)) * 0.5)
    tril = jnp.asarray(
        np.tril(rng.normal(size=(2, n, n)) * 0.2) + np.eye(n)[None]
    )
    dist = MultivariateNormalTriL(loc, tril)
    analytic = np.asarray(kl_mvn_tril_standard_normal(loc, tril))
    # MC estimate: E_q[log q(z) - log p(z)]
    z = dist.sample(jax.random.PRNGKey(1), (100_000,))
    logq = np.asarray(dist.log_prob(z))
    logp = np.asarray(
        -0.5 * jnp.sum(z**2, -1) - 0.5 * n * np.log(2 * np.pi)
    )
    mc = (logq - logp).mean(0)
    np.testing.assert_allclose(analytic, mc, rtol=0.02)
    assert (analytic >= 0).all()


def test_kl_zero_for_standard_normal():
    n = 8
    loc = jnp.zeros((n,))
    tril = jnp.eye(n)
    np.testing.assert_allclose(
        float(kl_mvn_tril_standard_normal(loc, tril)), 0.0, atol=1e-6
    )


def test_pixel_normal_log_prob_vs_scipy():
    rng = np.random.default_rng(5)
    loc = rng.normal(size=(2, 4, 4, 3))
    scale = 1e-4 + np.abs(rng.normal(size=(2, 4, 4, 3)))
    x = rng.normal(size=(2, 4, 4, 3))
    dist = PixelNormal(jnp.asarray(loc), jnp.asarray(scale))
    got = np.asarray(dist.log_prob(jnp.asarray(x)))
    want = stats.norm(loc, scale).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist.mean()), loc, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dist.stddev()), scale, rtol=1e-6)


def test_pixel_normal_sample_shape_and_stats():
    loc = jnp.ones((2, 3)) * 2.0
    scale = jnp.ones((2, 3)) * 0.5
    dist = PixelNormal(loc, scale)
    s = dist.sample(jax.random.PRNGKey(2), (50_000,))
    assert s.shape == (50_000, 2, 3)
    np.testing.assert_allclose(np.asarray(s).mean(0), np.asarray(loc), atol=0.02)
    np.testing.assert_allclose(np.asarray(s).std(0), np.asarray(scale), atol=0.02)
