"""End-to-end science validation of the shipped demo deblender.

The deblending paper behind the reference (Arcelin et al. 2020, linked at
/root/reference/README.md:13) evaluates flux and ellipticity recovery; the
reference repo has no such harness (measure/ is an empty stub).  This test
pins the one here (scripts/science_validation.py): the packaged sim_demo
weights must recover per-band flux, centroid and ellipticity of the
isolated truth from held-out simulated blends far better than measuring
the raw blend (the "do nothing" floor).

Measured on XLA CPU fp32 with the round-3 retrained weights (n=96,
seed 777): flux rel err median 1.31 (blend) -> 0.109 (deblended);
centroid err 4.25 px -> 0.015 px; ellipticity err 0.252 -> 0.026.
Bounds below carry 2-3x margin.
"""

import sys
from pathlib import Path

import pytest

from debvader_tpu.training.checkpoint import default_weights_dir

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.fixture(scope="module")
def metrics():
    if not (default_weights_dir() / "sim_demo").exists():
        pytest.skip("sim_demo weights not present")
    from science_validation import recovery_metrics

    return recovery_metrics(n=96)


def test_flux_recovery(metrics):
    m = metrics
    assert m["flux_relerr_med_deblended"] < 0.25
    assert m["flux_relerr_med_deblended"] < 0.25 * m["flux_relerr_med_blend"]
    assert m["flux_relerr_p90_deblended"] < 0.6


def test_centroid_recovery(metrics):
    m = metrics
    assert m["centroid_err_med_deblended"] < 0.1  # px
    assert m["centroid_err_med_deblended"] < 0.1 * m["centroid_err_med_blend"]


def test_ellipticity_recovery(metrics):
    m = metrics
    assert m["ellip_err_med_deblended"] < 0.08
    assert m["ellip_err_med_deblended"] < m["ellip_err_med_blend"] / 3.0
