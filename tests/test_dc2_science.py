"""DC2-gated end-to-end science harness (VERDICT r3 "next round" #8).

With ``DEBVADER_TF_CKPT`` pointing at a FULL reference checkpoint prefix
(the bundled one has its second shard stripped — .MISSING_LARGE_BLOBS),
one command runs, on the three bundled 259x259x6 DC2 fields with their
truth-catalog coordinates:

    DEBVADER_TF_CKPT=/path/to/weights_noisy_v4.386--6.61.ckpt \
        python -m pytest tests/test_dc2_parity.py tests/test_dc2_science.py -v

- weight-value parity (test_dc2_parity.py, the fidelity clause), then
- a full field deblend with the imported weights in the fidelity serving
  mode, with photometry columns from ops/measure — the
  scripts/science_validation.py machinery applied to REAL survey data —
  asserting the deblender's end-to-end products are scientifically sane:
  the rendered model removes flux (residual RMS drops), every truth source
  inside the extraction-valid region lands a finite catalog row, and
  measured fluxes are positive for the bright sources.

Truth catalogs hold GLOBAL (x, y) positions; center offsets are
``(truth - field_center)[:, [1, 0]]`` (the convention the in-repo DC2
slice test uses).  Fields 2 and 3 ship their center files; field 1 does
not, so the harness covers 2 and 3
(/root/reference/src/debvader/data/dc2_imgs/field/).
"""

import os
from pathlib import Path

import numpy as np
import pytest

CKPT = os.environ.get("DEBVADER_TF_CKPT")
FIELD_DIR = Path("/root/reference/src/debvader/data/dc2_imgs/field")

pytestmark = pytest.mark.skipif(
    not CKPT,
    reason="set DEBVADER_TF_CKPT to a full reference checkpoint prefix",
)

FIELDS = [
    (
        "field_img_2.npy",
        "gal_coordinates_complete_truth_catalog_2.npy",
        "field_center_2.npy",
    ),
    (
        "field_img_3.npy",
        "gal_coordinates_complete_truth_catalog_3.npy",
        "field_center_3.npy",
    ),
]


@pytest.fixture(scope="module")
def dc2_net():
    from debvader_tpu.config import fidelity_serving_config
    from debvader_tpu.models.vae import DeblenderVAE
    from debvader_tpu.utils.flux_cal import attach_flux_calibration
    from debvader_tpu.utils.weight_import import import_reference_checkpoint

    variables = import_reference_checkpoint(CKPT)
    model = DeblenderVAE(fidelity_serving_config())
    return model, attach_flux_calibration(model, variables)


@pytest.mark.parametrize("field_name,truth_name,center_name", FIELDS)
def test_dc2_field_science(dc2_net, field_name, truth_name, center_name):
    from debvader_tpu.pipeline.field import DeblendField

    field = np.load(FIELD_DIR / field_name).astype(np.float32)
    truth_xy = np.load(FIELD_DIR / truth_name)
    center = np.load(FIELD_DIR / center_name)
    truth = (truth_xy - center)[:, [1, 0]].astype(np.float32)
    df = DeblendField(dc2_net, field, z_mode="mean")
    catalog, residual = df.deblend_and_render(
        truth, optimise_positions=True, measure=True
    )
    assert catalog is not None

    # every extraction-valid truth source got a finite catalog row
    f, cs = field.shape[1], 59
    starts = np.trunc(truth).astype(int) + (f // 2 - cs // 2)
    n_valid = int(np.all((starts >= 0) & (starts + cs <= f), axis=1).sum())
    assert len(catalog) == n_valid > 0

    # photometry columns are present and finite (science_validation
    # machinery: ops/measure flux/centroid/ellipticity/snr)
    for col in ("flux", "centroid", "ellipticity", "snr"):
        vals = np.stack([np.atleast_1d(row[col]) for row in catalog])
        assert np.isfinite(vals).all(), f"non-finite {col}"
    total_flux = np.stack([np.asarray(row["flux"]) for row in catalog]).sum(-1)
    # at least the brighter half of the truth sources measure positive flux
    assert (total_flux > 0).mean() > 0.5

    # the rendered model genuinely explains field flux: residual RMS drops
    rms_before = float(np.sqrt(np.mean(field**2)))
    rms_after = float(np.sqrt(np.mean(residual**2)))
    assert rms_after < rms_before

    # registration stayed within the reference's bounds (+-3 px)
    shifts = np.stack([np.asarray(row["shifts"]) for row in catalog])
    assert np.all(np.abs(shifts) <= 3.0 + 1e-6)


def test_dc2_stamps_deblend_finite(dc2_net):
    """The 12 bundled real cutouts (galaxies_from_field.npy) through the
    fidelity-mode forward: finite, non-negative mean images."""
    import debvader_tpu as dt

    stamps = np.load(FIELD_DIR / "galaxies_from_field.npy").astype(np.float32)
    means, dist = dt.deblend(dc2_net, stamps, z_mode="mean")
    means = np.asarray(means)
    assert means.shape == stamps.shape
    assert np.isfinite(means).all()
    assert (means >= 0).all()  # relu'd loc head
