"""Pallas render kernel: interpreter-mode parity vs the XLA scan renderer."""

import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.kernels.render import render_field_pallas
from debvader_tpu.ops.shift import render_field


def _case(n, s, b, f, seed=0):
    rng = np.random.default_rng(seed)
    stamps = rng.random((n, s, s, b)).astype(np.float32)
    offsets = rng.uniform(-f / 2, f / 2, size=(n, 2)).astype(np.float32)
    return stamps, offsets


@pytest.mark.parametrize("f,tile", [(64, 32), (100, 32), (128, 128)])
def test_parity_with_xla_renderer(f, tile):
    stamps, offsets = _case(6, 9, 2, f)
    want = np.asarray(render_field(jnp.asarray(stamps), jnp.asarray(offsets), f))
    got = np.asarray(
        render_field_pallas(
            jnp.asarray(stamps), jnp.asarray(offsets), f, tile=tile, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fractional_offsets_parity():
    stamps, _ = _case(3, 7, 1, 50)
    offsets = np.array([[0.3, -0.7], [10.25, 5.5], [-12.9, 0.1]], np.float32)
    want = np.asarray(render_field(jnp.asarray(stamps), jnp.asarray(offsets), 50))
    got = np.asarray(
        render_field_pallas(jnp.asarray(stamps), jnp.asarray(offsets), 50,
                            tile=32, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mask_parity():
    stamps, offsets = _case(4, 7, 2, 40)
    mask = jnp.asarray([True, False, True, False])
    want = np.asarray(
        render_field(jnp.asarray(stamps), jnp.asarray(offsets), 40, mask)
    )
    got = np.asarray(
        render_field_pallas(
            jnp.asarray(stamps), jnp.asarray(offsets), 40,
            mask=mask, tile=32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_off_field_sources_zero():
    stamps, _ = _case(1, 7, 1, 30)
    offsets = np.array([[100.0, 100.0]], np.float32)
    got = np.asarray(
        render_field_pallas(jnp.asarray(stamps), jnp.asarray(offsets), 30,
                            tile=32, interpret=True)
    )
    np.testing.assert_array_equal(got, 0.0)


def test_dc2_scale_case():
    # field-size / stamp-size of the real workload (shrunk batch)
    stamps, offsets = _case(12, 59, 6, 259, seed=3)
    want = np.asarray(render_field(jnp.asarray(stamps), jnp.asarray(offsets), 259))
    got = np.asarray(
        render_field_pallas(jnp.asarray(stamps), jnp.asarray(offsets), 259,
                            tile=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=3e-5)
