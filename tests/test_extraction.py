"""Border semantics of cutout extraction, mirroring the reference test
(tests/test_extraction.py:6-62) plus batch/validity coverage."""

import numpy as np

from debvader_tpu.ops.extraction import extract_cutouts, extract_cutouts_host


def _field(rng, field_size=15, bands=3):
    return rng.random((1, field_size, field_size, bands))


def test_interior_cutout(rng_np):
    image = _field(rng_np)
    cutouts, idx = extract_cutouts_host(
        field_image=image.copy(),
        field_size=15,
        galaxy_distances_to_center=[[-4, -3]],
        cutout_size=5,
        nb_of_bands=3,
    )
    assert idx == [0]
    np.testing.assert_allclose(cutouts[0], image[0, 1:6, 2:7])


def test_cutout_touching_high_border(rng_np):
    image = _field(rng_np)
    cutouts, idx = extract_cutouts_host(
        image.copy(), 15, [[5, 5]], cutout_size=5, nb_of_bands=3
    )
    assert idx == [0]
    np.testing.assert_allclose(cutouts[0], image[0, 10:, 10:])


def test_cutout_touching_low_border(rng_np):
    image = _field(rng_np)
    cutouts, idx = extract_cutouts_host(
        image.copy(), 15, [[-5, -5]], cutout_size=5, nb_of_bands=3
    )
    assert idx == [0]
    np.testing.assert_allclose(cutouts[0], image[0, :5, :5])


def test_cutout_out_of_bounds_dropped(rng_np):
    image = _field(rng_np)
    cutouts, idx = extract_cutouts_host(
        image.copy(), 15, [[6, 6]], cutout_size=5, nb_of_bands=3
    )
    assert len(idx) == 0
    np.testing.assert_array_equal(cutouts[0], 0.0)


def test_low_side_out_of_bounds_dropped(rng_np):
    # Negative start indices would silently wrap in naive numpy slicing; the
    # reference drops them via the ValueError path, and so must we.
    image = _field(rng_np)
    _, idx = extract_cutouts_host(
        image.copy(), 15, [[-6, 0]], cutout_size=5, nb_of_bands=3
    )
    assert len(idx) == 0


def test_batched_mixed_validity(rng_np):
    image = _field(rng_np)
    centers = [[-4, -3], [6, 6], [0, 0], [-6, -6]]
    cutouts, valid = extract_cutouts(
        image.copy(), 15, centers, cutout_size=5, nb_of_bands=3
    )
    np.testing.assert_array_equal(np.asarray(valid), [True, False, True, False])
    np.testing.assert_allclose(np.asarray(cutouts[0]), image[0, 1:6, 2:7])
    np.testing.assert_allclose(np.asarray(cutouts[2]), image[0, 5:10, 5:10])
    np.testing.assert_array_equal(np.asarray(cutouts[1]), 0.0)


def test_fractional_centers_truncate_like_reference(rng_np):
    # Reference applies int() to shifts (truncation toward zero).
    image = _field(rng_np)
    a, _ = extract_cutouts(image, 15, [[-4.7, -3.2]], cutout_size=5, nb_of_bands=3)
    b, _ = extract_cutouts(image, 15, [[-4, -3]], cutout_size=5, nb_of_bands=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_empty_centers(rng_np):
    image = _field(rng_np)
    cutouts, valid = extract_cutouts(image, 15, np.zeros((0, 2)), 5, 3)
    assert cutouts.shape == (0, 5, 5, 3)
    assert valid.shape == (0,)


def test_host_extraction_equals_device(rng_np):
    """extract_cutouts_np (the recarray's no-transfer path) must equal the
    jitted device extraction bit-for-bit, including border and fractional
    semantics."""
    from debvader_tpu.ops.extraction import extract_cutouts_np

    image = _field(rng_np)
    centers = [[-4.7, -3.2], [0.0, 0.0], [6.0, 6.0], [-99.0, 0.0], [5.0, -5.0]]
    dev_c, dev_v = extract_cutouts(image, 15, centers, cutout_size=5, nb_of_bands=3)
    host_c, host_v = extract_cutouts_np(image, centers, cutout_size=5)
    np.testing.assert_array_equal(np.asarray(dev_v), host_v)
    np.testing.assert_array_equal(np.asarray(dev_c), host_c)
