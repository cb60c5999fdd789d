#!/usr/bin/env python
"""Survey-scale serving: catalogs + residual fields with device-resident
stamps.

The reference has no counterpart — its scene pipeline tops out at a single
259x259 field with every per-source product round-tripping through numpy
(SURVEY.md §5 long-context row).  This example runs the three serving
drivers on the bundled DC2 field (swap in a 4kx4k coadd unchanged):

- DeblendField.deblend_and_render: one pass, catalog + residual, stamps
  never downloaded;
- DeblendField.deblend_and_predict: same stream, plus the reference's
  predicted-field trio (mean/stddev/epistemic canvases) accumulated on
  device;
- TiledDeblendField.detect_deblend_render: tiled COO detection feeding the
  same streaming core (the 4k-coadd path);
- IterativeDeblendField.iterative_deblend_and_render: detect-subtract-
  repeat with the running residual held on device between steps.

Run: python examples/survey_serving.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

import debvader_tpu as dt

FIELD = "/root/reference/src/debvader/data/dc2_imgs/field/field_img_2.npy"


def main():
    field = np.load(FIELD).astype(np.float32)
    print(f"field: {field.shape}")

    try:
        model, variables = dt.load_deblender("sim_demo")
        print("loaded packaged sim_demo weights")
    except FileNotFoundError:
        model = dt.create_model_vae(dt.ModelConfig(dtype="bfloat16"))
        variables = dt.init_vae(model, jax.random.PRNGKey(0))
        print("no packaged weights; using random init")
    net = (model, variables)

    # --- one-pass serving: detect, then catalog + residual ----------------
    centers = dt.detect_objects(field)
    print(f"detections: {len(centers)}")
    df = dt.DeblendField(net, field)
    catalog, residual = df.deblend_and_render(centers, measure=True)
    if catalog is None:
        print("deblend_and_render: no sources survived")
    else:
        print(
            f"deblend_and_render: {len(catalog)} rows, columns "
            f"{catalog.dtype.names}, residual rms "
            f"{np.sqrt(np.mean(residual**2)):.4f}"
        )

    # --- predicted-field serving: mean/stddev/epistemic canvases ----------
    dfp = dt.DeblendField(net, field, epistemic_uncertainty_estimation=True)
    cat_p, fields = dfp.deblend_and_predict(centers)
    if cat_p is not None:
        print(
            "deblend_and_predict: model flux "
            f"{fields['predicted_mean_field'].sum():.1f}, stddev sum "
            f"{fields['predicted_stddev_field'].sum():.1f}, epistemic sum "
            f"{fields['predicted_epistemic_field'].sum():.3f}"
        )

    # --- tiled driver (the 4k-coadd path; tiles trivially cover 259) ------
    tdf = dt.TiledDeblendField(net, field)
    cat_t, res_t = tdf.detect_deblend_render()
    print(f"detect_deblend_render: {0 if cat_t is None else len(cat_t)} rows")

    # --- iterative: re-detect on the device-resident residual -------------
    idf = dt.IterativeDeblendField(net, field)
    cat_i, res_i = idf.iterative_deblend_and_render(max_iterations=3)
    found = 0 if cat_i is None else len(cat_i)
    print(
        f"iterative_deblend_and_render: {found} sources over "
        f"{0 if cat_i is None else int(cat_i.iteration.max()) + 1} iterations, "
        f"mse trace {['%.2e' % m for m in idf.mse]}"
    )


if __name__ == "__main__":
    main()
