"""Order-3 spline shift: scipy.ndimage parity incl. borders, and the
order-3 render path vs the reference's padded-canvas assembly."""

import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from debvader_tpu.ops.shift import render_field
from debvader_tpu.ops.spline import spline_prefilter, subpixel_shift_spline


def test_prefilter_matches_scipy():
    rng = np.random.default_rng(0)
    img = rng.random((17, 23)).astype(np.float32)
    got = np.asarray(spline_prefilter(jnp.asarray(img)))
    want = scipy.ndimage.spline_filter(img.astype(np.float64), order=3, mode="mirror")
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_shift_matches_scipy_order3():
    rng = np.random.default_rng(1)
    img = rng.random((31, 31)).astype(np.float32)
    for s in [(0.5, 0.5), (1.3, -0.7), (-2.2, 0.9), (7.25, -3.75), (0.0, 0.0)]:
        got = np.asarray(subpixel_shift_spline(jnp.asarray(img), jnp.asarray(s)))
        want = scipy.ndimage.shift(img, s, order=3, mode="constant")
        np.testing.assert_allclose(got, want, atol=5e-6)


def test_const_shift_matches_generic_and_scipy():
    """The gather-free constant-shift specialization (the render path) must
    equal the generic per-pixel-gather path — and scipy — for fractional
    shifts in [0, 1), including both endpoints' neighborhoods."""
    from debvader_tpu.ops.spline import subpixel_shift_spline_const

    rng = np.random.default_rng(3)
    img = rng.random((31, 29)).astype(np.float32)
    for s in [(0.0, 0.0), (0.5, 0.25), (0.999, 0.001), (0.0, 0.7), (0.3, 0.0)]:
        got = np.asarray(subpixel_shift_spline_const(jnp.asarray(img), jnp.asarray(s)))
        gen = np.asarray(subpixel_shift_spline(jnp.asarray(img), jnp.asarray(s)))
        want = scipy.ndimage.shift(img, s, order=3, mode="constant")
        np.testing.assert_allclose(got, gen, atol=5e-6)
        np.testing.assert_allclose(got, want, atol=5e-6)


def test_shift_multichannel():
    rng = np.random.default_rng(2)
    img = rng.random((15, 15, 4)).astype(np.float32)
    got = np.asarray(subpixel_shift_spline(jnp.asarray(img), jnp.asarray((0.4, -1.6))))
    for c in range(4):
        want = scipy.ndimage.shift(img[..., c], (0.4, -1.6), order=3, mode="constant")
        np.testing.assert_allclose(got[..., c], want, atol=5e-6)


def _reference_render_order3(stamps, offsets, field_size):
    """The reference's assembly (field_deblender.py:69-94) with scipy's
    default order=3."""
    n, s, _, b = stamps.shape
    out = np.zeros((field_size, field_size, b))
    pos0 = (field_size - s) // 2
    for i in range(n):
        padded = np.zeros((field_size, field_size, b))
        padded[pos0 : pos0 + s, pos0 : pos0 + s] = stamps[i]
        for band in range(b):
            out[:, :, band] += scipy.ndimage.shift(
                padded[:, :, band], offsets[i], order=3, mode="constant"
            )
    return out


def test_render_field_order3_matches_reference():
    rng = np.random.default_rng(3)
    stamps = rng.random((4, 9, 9, 2)).astype(np.float32)
    offsets = np.array(
        [[0.0, 0.0], [3.25, -2.5], [-6.75, 4.1], [10.6, 10.4]], np.float32
    )
    got = np.asarray(
        render_field(jnp.asarray(stamps), jnp.asarray(offsets), 41, order=3)
    )
    want = _reference_render_order3(stamps, offsets, 41)
    np.testing.assert_allclose(got, want, atol=2e-5)
