import jax.numpy as jnp
import numpy as np

from debvader_tpu.models.distributions import PixelNormal
from debvader_tpu.ops.normalize import (
    denormalize_distribution,
    denormalize_non_linear,
    normalize_non_linear,
)


def test_roundtrip(rng_np):
    x = rng_np.normal(size=(4, 8, 8, 6)) * 5.0
    normed = normalize_non_linear(jnp.asarray(x))
    assert (np.abs(np.asarray(normed)) < 1).all()
    back = denormalize_non_linear(normed)
    # float32: tanh saturation near |x|~5 limits roundtrip precision
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-3, atol=1e-3)


def test_matches_reference_formula(rng_np):
    x = rng_np.normal(size=(16,)) * 10
    np.testing.assert_allclose(
        np.asarray(normalize_non_linear(jnp.asarray(x))),
        np.tanh(np.arcsinh(x)),
        rtol=1e-6,
    )


def test_denormalize_distribution_delta_method():
    # For a tight distribution the delta method must match the empirical
    # moments of denormalize(samples).
    loc = jnp.asarray([[0.3, -0.5, 0.9]])
    scale = jnp.asarray([[0.01, 0.02, 0.005]])
    dist = denormalize_distribution(PixelNormal(loc, scale))
    rng = np.random.default_rng(0)
    samples = np.asarray(loc) + np.asarray(scale) * rng.normal(size=(200_000, 1, 3))
    denormed = np.sinh(np.arctanh(samples))
    np.testing.assert_allclose(np.asarray(dist.loc), denormed.mean(0), rtol=1e-3, atol=1e-4)
    # first-order delta method: ~1% in the high-curvature tail
    np.testing.assert_allclose(np.asarray(dist.scale), denormed.std(0), rtol=1.5e-2)
