"""Interpreter-mode parity for the fused decoder-tail kernel.

The kernel is parked at a Mosaic lowering boundary (see
kernels/tail_fused.py STATUS) but its arithmetic is complete; these tests
keep it correct — including the subtle off-image h1-halo zeroing that
chaining two SAME convs requires — so a future Mosaic-native layout only
has to solve the lowering, not the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.kernels.tail_fused import (
    fused_tail_pair,
    fused_tail_pair_reference,
)


def _inputs(B, H, W, CIN, C1, C2, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, H, W, CIN)), jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, CIN, C1)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C1,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(H, W, C1)) * 0.2, jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, C1, C2)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C2,)) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize(
    "B,H,W,tile",
    [
        (1, 16, 16, 16),  # single tile
        (2, 32, 32, 16),  # multi-tile, multi-batch
        (1, 24, 16, 16),  # ragged H (bottom tile padded)
    ],
)
def test_fused_tail_matches_xla_chain(B, H, W, tile):
    args = _inputs(B, H, W, 8, 8, 4)
    ref = fused_tail_pair_reference(*args)
    got = fused_tail_pair(*args, tile=tile, interpret=True)
    scale = float(jnp.abs(ref).max())
    # bf16x3 RNE limb products: ~1e-5 relative of fp32
    assert float(jnp.abs(got - ref).max()) < 5e-5 * scale


def test_fused_tail_border_zeroing():
    """The chained-SAME subtlety: conv2 must see zeros outside the image,
    not conv1's real halo outputs.  A constant-input field makes any halo
    leakage visible at the border rows/cols."""
    B, H, W = 1, 16, 16
    x, w1, b1, a1, w2, b2 = _inputs(B, H, W, 8, 8, 4, seed=3)
    x = jnp.ones_like(x)
    ref = fused_tail_pair_reference(x, w1, b1, a1, w2, b2)
    got = fused_tail_pair(x, w1, b1, a1, w2, b2, tile=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-5
    )
