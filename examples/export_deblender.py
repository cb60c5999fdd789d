#!/usr/bin/env python
"""AOT export, mirroring notebooks/deblender_to_onnx.ipynb: serialize the
deblender forward to a StableHLO artifact, reload it without the model code,
and check output parity against the live model.

Run: python examples/export_deblender.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

import debvader_tpu as dt
from debvader_tpu.utils.export import export_deblender, load_exported, roundtrip_check

STAMPS = "/root/reference/src/debvader/data/dc2_imgs/imgs_dc2.npy"


def plot_parity(stamps, mean, std, path="/tmp/deblender_export_parity.png"):
    """The notebook's visual check (deblender_to_onnx.ipynb final cells):
    input stamp / exported-artifact mean / stddev, r band, first 4 stamps."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # plotting is optional
        print("matplotlib unavailable; skipping parity plot")
        return
    k = min(4, len(stamps))
    fig, axes = plt.subplots(k, 3, figsize=(7, 2.2 * k), squeeze=False)
    for i in range(k):
        for j, (img, title) in enumerate(
            [(stamps[i], "input"), (mean[i], "exported mean"), (std[i], "stddev")]
        ):
            ax = axes[i][j]
            ax.imshow(np.asarray(img)[..., 2], origin="lower")
            ax.set_axis_off()
            if i == 0:
                ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    print(f"saved parity plot to {path}")


def main():
    stamps = np.load(STAMPS).astype(np.float32)
    model = dt.create_model_vae(dt.ModelConfig())
    variables = dt.init_vae(model, jax.random.PRNGKey(0))

    blob = export_deblender(model, variables, batch_size=len(stamps), path="/tmp/deblender.stablehlo")
    print(f"exported {len(blob) / 1e6:.1f} MB artifact")

    call = load_exported("/tmp/deblender.stablehlo")
    mean, std = call(stamps, jax.random.key_data(jax.random.PRNGKey(0)))
    print(f"reloaded artifact output: {mean.shape}, stddev floor {float(np.min(std)):.2e}")

    ok = roundtrip_check(model, variables, stamps)
    print("parity vs live model:", "PASS" if ok else "FAIL")

    plot_parity(stamps, mean, std)


if __name__ == "__main__":
    main()
