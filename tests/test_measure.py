"""Measurement-op tests against analytic elliptical Gaussians."""

import numpy as np

from debvader_tpu.ops.measure import (
    centroid,
    ellipticity,
    flux,
    measure_batch,
    second_moments,
    snr,
)


def _elliptical_gauss(s, cy, cx, sy, sx, rho=0.0, amp=1.0):
    yy, xx = np.mgrid[:s, :s].astype(np.float64)
    dy, dx = yy - cy, xx - cx
    det = sy**2 * sx**2 * (1 - rho**2)
    q = (dy**2 * sx**2 - 2 * rho * sy * sx * dy * dx + dx**2 * sy**2) / det
    return (amp * np.exp(-0.5 * q)).astype(np.float32)


def test_flux_total_and_aperture():
    g = _elliptical_gauss(41, 20, 20, 2.0, 2.0)
    stamps = np.stack([g, 2 * g])[..., None]
    f = np.asarray(flux(stamps))
    np.testing.assert_allclose(f[1], 2 * f[0], rtol=1e-6)
    np.testing.assert_allclose(f[0, 0], 2 * np.pi * 4.0, rtol=1e-3)
    f_ap = np.asarray(flux(stamps, radius=6.0))
    assert 0.9 * f[0, 0] < f_ap[0, 0] < f[0, 0]


def test_centroid_recovers_position():
    g = _elliptical_gauss(41, 23.4, 17.8, 2.0, 3.0)
    c = np.asarray(centroid(g[None, :, :, None]))
    np.testing.assert_allclose(c[0, 0], [23.4, 17.8], atol=0.05)


def test_second_moments_match_sigmas():
    g = _elliptical_gauss(61, 30, 30, 2.0, 4.0)
    q = np.asarray(second_moments(g[None, :, :, None]))[0, 0]
    np.testing.assert_allclose(q[0], 4.0, rtol=0.02)   # Qyy = sy^2
    np.testing.assert_allclose(q[1], 16.0, rtol=0.02)  # Qxx = sx^2
    np.testing.assert_allclose(q[2], 0.0, atol=0.05)


def test_ellipticity_round_and_elongated():
    round_g = _elliptical_gauss(41, 20, 20, 2.0, 2.0)
    e = np.asarray(ellipticity(round_g[None, :, :, None]))[0, 0]
    np.testing.assert_allclose(e, [0, 0], atol=1e-3)
    elong = _elliptical_gauss(61, 30, 30, 2.0, 4.0)
    e = np.asarray(ellipticity(elong[None, :, :, None]))[0, 0]
    # e1 = (16-4)/20 = 0.6 analytically
    np.testing.assert_allclose(e[0], 0.6, rtol=0.02)
    np.testing.assert_allclose(e[1], 0.0, atol=0.02)


def test_ellipticity_rotated():
    g = _elliptical_gauss(61, 30, 30, 2.0, 4.0, rho=0.5)
    e = np.asarray(ellipticity(g[None, :, :, None]))[0, 0]
    assert abs(e[1]) > 0.1  # cross term shows up in e2


def test_snr_scaling():
    g = _elliptical_gauss(41, 20, 20, 2.0, 2.0)
    mean = g[None, :, :, None]
    std = np.full_like(mean, 0.01)
    s1 = np.asarray(snr(mean, std))
    s2 = np.asarray(snr(mean, 2 * std))
    np.testing.assert_allclose(s1, 2 * s2, rtol=1e-6)


def test_measure_batch_bundle():
    g = _elliptical_gauss(41, 20, 20, 2.0, 3.0)
    stamps = np.repeat(g[None, :, :, None], 6, axis=-1)
    out = measure_batch(stamps, np.full_like(stamps, 0.01))
    assert out["flux"].shape == (1, 6)
    assert out["centroid"].shape == (1, 6, 2)
    assert out["ellipticity"].shape == (1, 6, 2)
    assert out["snr"].shape == (1, 6)
