"""Fused decoder-tail Pallas kernel: parity with the XLA op chain
(interpreter mode; TPU-compiled parity and timing are exercised by the
hardware drive scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.kernels.decoder_tail import (
    decoder_tail_reference,
    fused_decoder_tail,
)


def _inputs(n=8, s=16, c=8, o=6, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(n, s, s, c)) * 0.3, jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.uniform(0, 0.5, size=(s, s, c)), jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, c, o)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(o,)) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("nb", [2, 4])
def test_parity_with_xla_chain(nb):
    args = _inputs()
    want = np.asarray(decoder_tail_reference(*args))
    got = np.asarray(fused_decoder_tail(*args, nb=nb, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_parity_model_scale_slice():
    # real tail shape (shrunk batch): 64x64x32 -> 12
    args = _inputs(n=4, s=64, c=32, o=12, seed=1)
    want = np.asarray(decoder_tail_reference(*args))
    got = np.asarray(fused_decoder_tail(*args, nb=2, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_relu_and_prelu_behavior():
    # all-negative input: PReLU path and final relu floor both exercised
    x, k2, b2, a2, k3, b3 = _inputs(seed=2)
    x = -jnp.abs(x)
    want = np.asarray(decoder_tail_reference(x, k2, b2, a2, k3, b3))
    got = np.asarray(fused_decoder_tail(x, k2, b2, a2, k3, b3, nb=4, interpret=True))
    assert (got >= 0).all()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_batch_must_divide_nb():
    args = _inputs(n=6)
    with pytest.raises(ValueError):
        fused_decoder_tail(*args, nb=4, interpret=True)
