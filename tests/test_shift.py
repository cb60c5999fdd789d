"""Shift/render parity vs scipy.ndimage and registration recovery tests."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from debvader_tpu.ops.registration import (
    position_optimization,
    position_optimization_batch,
)
from debvader_tpu.ops.shift import render_field, subpixel_shift


def _gauss(s, cy, cx, sigma=3.0):
    yy, xx = np.mgrid[:s, :s]
    return np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)).astype(
        np.float32
    )


def test_subpixel_shift_matches_scipy_order1(rng_np):
    img = rng_np.random((21, 21)).astype(np.float32)
    for shift in [(0.0, 0.0), (1.0, -2.0), (0.3, 0.7), (-1.6, 2.4), (5.9, -3.1)]:
        got = np.asarray(subpixel_shift(jnp.asarray(img), jnp.asarray(shift)))
        want = scipy.ndimage.shift(img, shift, order=1, mode="constant", cval=0.0)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_subpixel_shift_const_matches_generic(rng_np):
    from debvader_tpu.ops.shift import subpixel_shift_const

    img = rng_np.random((21, 23)).astype(np.float32)
    for s in [(0.0, 0.0), (0.4, 0.9), (0.999, 0.0), (0.0, 0.5)]:
        got = np.asarray(subpixel_shift_const(jnp.asarray(img), jnp.asarray(s)))
        gen = np.asarray(subpixel_shift(jnp.asarray(img), jnp.asarray(s)))
        np.testing.assert_allclose(got, gen, atol=1e-6)


def test_subpixel_shift_close_to_spline3_on_smooth_images():
    # SURVEY.md §7 hard part (c): bilinear vs the reference's cubic spline on
    # PSF-smooth profiles.  Measured: <= ~2.6e-2 of unit peak at half-pixel
    # shifts for sigma=3 Gaussians — below the VAE's own reconstruction
    # error on DC2 stamps.  This pins the documented divergence.
    img = _gauss(31, 15.0, 15.0, sigma=3.0)
    for shift in [(0.5, 0.5), (1.3, -0.7), (-2.2, 0.9)]:
        got = np.asarray(subpixel_shift(jnp.asarray(img), jnp.asarray(shift)))
        want = scipy.ndimage.shift(img, shift, order=3, mode="constant")
        assert np.abs(got - want).max() < 3e-2


def test_subpixel_shift_multichannel(rng_np):
    img = rng_np.random((11, 11, 3)).astype(np.float32)
    got = np.asarray(subpixel_shift(jnp.asarray(img), jnp.asarray([0.5, -0.25])))
    for c in range(3):
        want = scipy.ndimage.shift(img[..., c], (0.5, -0.25), order=1, mode="constant")
        np.testing.assert_allclose(got[..., c], want, atol=1e-5)


def _reference_render(stamps, offsets, field_size):
    """The reference's padded-canvas + full-field shift assembly
    (field_deblender.py:69-94) with order-1 interpolation."""
    n, s, _, b = stamps.shape
    out = np.zeros((field_size, field_size, b))
    pos0 = (field_size - s) // 2
    for i in range(n):
        padded = np.zeros((field_size, field_size, b))
        padded[pos0 : pos0 + s, pos0 : pos0 + s] = stamps[i]
        for band in range(b):
            out[:, :, band] += scipy.ndimage.shift(
                padded[:, :, band], offsets[i], order=1, mode="constant"
            )
    return out


def test_render_field_matches_reference_assembly(rng_np):
    stamps = rng_np.random((4, 7, 7, 2)).astype(np.float32)
    offsets = np.array(
        [[0.0, 0.0], [3.25, -2.5], [-6.75, 4.1], [10.0, 10.0]], np.float32
    )
    got = np.asarray(render_field(jnp.asarray(stamps), jnp.asarray(offsets), 25))
    want = _reference_render(stamps, offsets, 25)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_render_field_off_field_source_contributes_nothing(rng_np):
    stamps = rng_np.random((1, 7, 7, 1)).astype(np.float32)
    # offset far outside the field
    got = np.asarray(render_field(jnp.asarray(stamps), jnp.asarray([[40.0, 0.0]]), 25))
    np.testing.assert_array_equal(got, 0.0)


def test_render_field_partially_visible_source(rng_np):
    stamps = np.ones((1, 7, 7, 1), np.float32)
    offsets = np.array([[11.0, 0.0]], np.float32)  # hangs off the bottom edge
    got = np.asarray(render_field(jnp.asarray(stamps), jnp.asarray(offsets), 25))
    want = _reference_render(stamps, offsets, 25)
    np.testing.assert_allclose(got[..., 0], want[..., 0], atol=1e-5)
    assert got.sum() > 0


def test_render_field_mask(rng_np):
    stamps = rng_np.random((3, 5, 5, 1)).astype(np.float32)
    offsets = np.zeros((3, 2), np.float32)
    mask = jnp.asarray([True, False, True])
    got = np.asarray(render_field(jnp.asarray(stamps), jnp.asarray(offsets), 15, mask))
    want = _reference_render(stamps[[0, 2]], offsets[[0, 2]], 15)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_position_optimization_recovers_known_shift():
    # Plant a galaxy at center + (1.7, -0.8); detector reports (1, -1)
    # (integer detection); the optimizer must recover the residual.
    f, s = 41, 15
    true_shift = np.array([1.7, -0.8])
    det = np.array([1.0, -1.0])
    stamp = _gauss(s, 7.0, 7.0, sigma=2.0)
    field = np.zeros((f, f, 3), np.float32)
    pos0 = (f - s) // 2
    padded = np.zeros((f, f), np.float32)
    padded[pos0 : pos0 + s, pos0 : pos0 + s] = stamp
    field[..., 2] = scipy.ndimage.shift(padded, true_shift, order=1)

    pred_padded = np.zeros((f, f, 3), np.float32)
    pred_padded[..., 2] = padded

    sx, sy = position_optimization(field, pred_padded, det)
    np.testing.assert_allclose([det[0] + sx, det[1] + sy], true_shift, atol=0.05)


def test_position_optimization_batch_multiple_sources():
    f, s = 51, 15
    stamp = _gauss(s, 7.0, 7.0, sigma=2.0)
    dets = np.array([[-10.0, -10.0], [12.0, 5.0]], np.float32)
    resid = np.array([[0.6, -0.4], [-1.2, 0.9]], np.float32)
    field = np.zeros((f, f), np.float32)
    pos0 = (f - s) // 2
    for d, r in zip(dets, resid):
        padded = np.zeros((f, f), np.float32)
        padded[pos0 : pos0 + s, pos0 : pos0 + s] = stamp
        field += scipy.ndimage.shift(padded, d + r, order=1)

    preds = np.stack([stamp, stamp])
    shifts = np.asarray(
        position_optimization_batch(
            jnp.asarray(field), jnp.asarray(preds), jnp.asarray(dets)
        )
    )
    np.testing.assert_allclose(shifts, resid, atol=0.1)


def test_position_optimization_respects_bounds():
    f, s = 41, 15
    stamp = _gauss(s, 7.0, 7.0, sigma=2.0)
    field = np.zeros((f, f), np.float32)  # empty field: arbitrary pull
    shifts = np.asarray(
        position_optimization_batch(
            jnp.asarray(field),
            jnp.asarray(stamp[None]),
            jnp.asarray([[0.0, 0.0]], np.float32),
            bound=3.0,
        )
    )
    assert (np.abs(shifts) <= 3.0 + 1e-6).all()


def test_position_optimization_ignores_nan_field_pixels():
    """A chip-gap pixel anywhere in the field must not poison the
    Gauss-Newton normal equations (0 * NaN = NaN in jac.T @ r covered the
    whole field): shifts stay finite and recover a known offset."""
    import jax.numpy as jnp

    from debvader_tpu.ops.registration import position_optimization_batch
    from debvader_tpu.ops.shift import subpixel_shift

    rng = np.random.default_rng(0)
    f, s = 64, 23
    yy, xx = np.mgrid[:s, :s]
    stamp = np.exp(-((yy - s // 2) ** 2 + (xx - s // 2) ** 2) / 8.0).astype(np.float32)
    field = (0.001 * rng.normal(size=(f, f))).astype(np.float32)
    pos0 = (f - s) // 2
    canvas = np.zeros((f, f), np.float32)
    canvas[pos0 : pos0 + s, pos0 : pos0 + s] = stamp
    true_shift = np.array([1.3, -0.7], np.float32)
    field += np.asarray(subpixel_shift(jnp.asarray(canvas), jnp.asarray(true_shift)))
    field[2, 2] = np.nan  # a gap pixel far from the source

    shifts = np.asarray(
        position_optimization_batch(
            jnp.asarray(field), jnp.asarray(stamp)[None],
            jnp.asarray([[0.0, 0.0]], np.float32),
        )
    )
    assert np.isfinite(shifts).all()
    np.testing.assert_allclose(shifts[0], true_shift, atol=0.05)


def test_position_optimization_windowed_matches_full_field(rng_np):
    """The windowed solver's normal equations receive exactly-zero terms
    from every pixel outside the window (the shift Jacobian's support is
    the stamp footprint), so its shifts equal the full-field solver's up
    to float summation order — including sources flush at the field
    border, where the window clamps to the field edge and clips the
    support at the same pixels the full-field canvas does."""
    from debvader_tpu.ops.registration import (
        position_optimization_batch_windowed,
    )

    f, s = 101, 15
    stamp = _gauss(s, 7.0, 7.0, sigma=2.0)
    # assorted positions: interior, fractional, and flush at the low border
    dets = np.array(
        [[-30.0, -28.0], [10.0, 17.0], [0.0, 0.0], [-43.0, -40.0]],
        np.float32,
    )
    resid = np.array(
        [[0.6, -0.4], [-1.2, 0.9], [0.3, 0.2], [0.8, -0.7]], np.float32
    )
    field = (0.01 * rng_np.normal(size=(f, f))).astype(np.float32)
    pos0 = (f - s) // 2
    for d, r in zip(dets, resid):
        padded = np.zeros((f, f), np.float32)
        padded[pos0 : pos0 + s, pos0 : pos0 + s] = stamp
        field += scipy.ndimage.shift(padded, d + r, order=1)

    preds = np.stack([stamp] * len(dets))
    full = np.asarray(
        position_optimization_batch(
            jnp.asarray(field), jnp.asarray(preds), jnp.asarray(dets)
        )
    )
    windowed = np.asarray(
        position_optimization_batch_windowed(
            jnp.asarray(field), jnp.asarray(preds), jnp.asarray(dets)
        )
    )
    np.testing.assert_allclose(windowed, full, atol=1e-3)
    np.testing.assert_allclose(windowed, resid, atol=0.1)


def test_position_optimization_windowed_rectangular_band(rng_np):
    """Row-band registration (the sharded serving path): a (H, W) band with
    offsets relative to the band center recovers a planted shift."""
    from debvader_tpu.ops.registration import (
        position_optimization_batch_windowed,
    )

    h, w, s = 40, 101, 15
    stamp = _gauss(s, 7.0, 7.0, sigma=2.0)
    det = np.array([[-5.0, 20.0]], np.float32)
    resid = np.array([[0.9, -0.6]], np.float32)
    band = (0.005 * rng_np.normal(size=(h, w))).astype(np.float32)
    padded = np.zeros((h, w), np.float32)
    padded[(h - s) // 2 : (h - s) // 2 + s, (w - s) // 2 : (w - s) // 2 + s] = stamp
    band += scipy.ndimage.shift(padded, det[0] + resid[0], order=1)

    got = np.asarray(
        position_optimization_batch_windowed(
            jnp.asarray(band), jnp.asarray(stamp)[None], jnp.asarray(det)
        )
    )
    np.testing.assert_allclose(got, resid, atol=0.1)


def test_position_optimization_windowed_small_field_fallback():
    """Fields smaller than the window route to the full-field solve."""
    from debvader_tpu.ops.registration import (
        position_optimization_batch_windowed,
        registration_window,
    )

    f, s = 20, 15  # window would be 27 > 20
    assert registration_window(s, 3.0) > f
    stamp = _gauss(s, 7.0, 7.0, sigma=2.0)
    field = np.zeros((f, f), np.float32)
    pos0 = (f - s) // 2
    field[pos0 : pos0 + s, pos0 : pos0 + s] = stamp
    full = np.asarray(
        position_optimization_batch(
            jnp.asarray(field), jnp.asarray(stamp)[None],
            jnp.asarray([[0.0, 0.0]], np.float32),
        )
    )
    windowed = np.asarray(
        position_optimization_batch_windowed(
            jnp.asarray(field), jnp.asarray(stamp)[None],
            jnp.asarray([[0.0, 0.0]], np.float32),
        )
    )
    np.testing.assert_allclose(windowed, full, atol=1e-6)


def test_render_field_rectangular(rng_np):
    """A (H, W) rectangular canvas renders identically to the square canvas
    over the shared central window (per-axis centered placement)."""
    stamps = rng_np.random((4, 5, 5, 2)).astype(np.float32)
    offs = np.array(
        [[0.3, -1.2], [2.0, 3.5], [-4.1, 0.0], [6.2, -5.5]], np.float32
    )
    sq = np.asarray(render_field(jnp.asarray(stamps), jnp.asarray(offs), 21))
    rect = np.asarray(
        render_field(jnp.asarray(stamps), jnp.asarray(offs), (21, 21))
    )
    np.testing.assert_array_equal(rect, sq)
    tall = np.asarray(
        render_field(jnp.asarray(stamps), jnp.asarray(offs), (31, 21))
    )
    # row pos0 moves by (31-5)//2 - (21-5)//2 = 5
    np.testing.assert_allclose(tall[5:26], sq, atol=1e-6)


def test_position_optimization_windowed_crowded_scene(rng_np):
    """Heavily overlapping sources: Gauss-Newton is chaotic near knots, so
    this pins the one-sided-derivative convention at integer shifts (the
    GN start) — with the ceil-1 decomposition the windowed solver tracks
    the full-field iterates through all 20 iterations even when every
    pixel lies under many blobs."""
    from debvader_tpu.ops.registration import (
        position_optimization_batch_windowed,
    )

    f, s, n = 121, 31, 24
    yy, xx = np.mgrid[:s, :s].astype(np.float32)
    preds = np.stack(
        [
            a * np.exp(-((yy - s // 2) ** 2 + (xx - s // 2) ** 2) / (2 * g**2))
            for a, g in zip(
                rng_np.uniform(1, 3, n), rng_np.uniform(1.5, 3.0, n)
            )
        ]
    ).astype(np.float32)
    lo, hi = -(f // 2) + s, f // 2 - s
    dets = rng_np.uniform(lo, hi, size=(n, 2)).astype(np.float32)
    field = (0.01 * rng_np.normal(size=(f, f))).astype(np.float32)
    pos0 = (f - s) // 2
    for p, d in zip(preds, dets):
        padded = np.zeros((f, f), np.float32)
        padded[pos0 : pos0 + s, pos0 : pos0 + s] = p
        field += scipy.ndimage.shift(
            padded, d + rng_np.uniform(-1.2, 1.2, 2), order=1
        ).astype(np.float32)

    full = np.asarray(
        position_optimization_batch(
            jnp.asarray(field), jnp.asarray(preds), jnp.asarray(dets)
        )
    )
    windowed = np.asarray(
        position_optimization_batch_windowed(
            jnp.asarray(field), jnp.asarray(preds), jnp.asarray(dets)
        )
    )
    np.testing.assert_allclose(windowed, full, atol=1e-4)


def test_position_optimization_windowed_border_flush_even_field(rng_np):
    """Regression: on an even-size field, pos0 + floor(offset) for an
    extraction-valid border-flush source can sit 1-2 px BEFORE the clamped
    window origin; the placement must CLIP the overhanging stamp rows like
    the full-field canvas does, not clamp-shift the whole stamp."""
    from debvader_tpu.ops.registration import (
        position_optimization_batch_windowed,
    )

    f, s = 100, 15
    stamp = _gauss(s, 7.0, 7.0, sigma=2.0)
    true = np.array([0.4, 0.3], np.float32)
    pos0 = (f - s) // 2
    for det in ([-43.0, -40.0], [-42.6, 10.0], [42.0, 42.0], [-43.0, 42.9]):
        field = (0.001 * rng_np.normal(size=(f, f))).astype(np.float32)
        canvas = np.zeros((f, f), np.float32)
        canvas[pos0 : pos0 + s, pos0 : pos0 + s] = stamp
        field += scipy.ndimage.shift(
            canvas, np.asarray(det) + true, order=1
        ).astype(np.float32)
        full = np.asarray(
            position_optimization_batch(
                jnp.asarray(field), jnp.asarray(stamp)[None],
                jnp.asarray([det], jnp.float32),
            )
        )[0]
        windowed = np.asarray(
            position_optimization_batch_windowed(
                jnp.asarray(field), jnp.asarray(stamp)[None],
                jnp.asarray([det], jnp.float32),
            )
        )[0]
        np.testing.assert_allclose(windowed, full, atol=1e-4)
        np.testing.assert_allclose(windowed, true, atol=0.05)
