#!/usr/bin/env python
"""Field-sharded survey serving over a device mesh.

Single-chip serving holds the whole coadd plus a render canvas in one
chip's HBM (16 GB caps it at 16k x 16k x 6 with bfloat16 residency);
``ShardedFieldDeblender`` shards the FIELD itself into row bands so
per-chip residency scales with 1/D — an 8-chip v5e mesh serves a
32k x 32k x 6 float32 coadd (~3.4 GB/chip) no single chip can hold.

This example runs on a virtual 8-device CPU mesh (the standard
xla_force_host_platform trick; on a real slice drop the two config lines
and the mesh spans the chips over ICI):

- detect_objects: per-band tiled detection riding the 'data'-sharded
  batched detection core;
- deblend_and_render: chunked extract -> forward -> windowed registration
  -> render, all band-local (no hot-loop collectives), one ppermute strip
  fold per field;
- iterative_deblend_and_render: detect-subtract-repeat with the running
  residual band-sharded between steps.

Run: python examples/sharded_survey_serving.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

if jax.default_backend() != "tpu" or len(jax.devices()) < 2:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import debvader_tpu as dt
from debvader_tpu.config import DetectionConfig, PipelineConfig
from debvader_tpu.parallel import make_mesh
from debvader_tpu.pipeline.sharded_field import ShardedFieldDeblender


def build_coadd(f=1024, n_src=120, bands=3, seed=0):
    rng = np.random.default_rng(seed)
    img = (0.01 * rng.normal(size=(f, f))).astype(np.float32)
    yy, xx = np.mgrid[-6:7, -6:7]
    prof = np.exp(-(yy**2 + xx**2) / (2 * 1.6**2)).astype(np.float32)
    for cy, cx, a in zip(
        rng.uniform(40, f - 40, n_src).astype(int),
        rng.uniform(40, f - 40, n_src).astype(int),
        rng.uniform(0.5, 4.0, n_src),
    ):
        img[cy - 6 : cy + 7, cx - 6 : cx + 7] += a * prof
    return np.repeat(img[None, :, :, None], bands, axis=-1)


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    field = build_coadd()
    print(f"devices: {n_dev} ({jax.default_backend()}), field {field.shape}")

    model = dt.DeblenderVAE(
        dt.ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=8,
                       filters=(8, 16), kernels=(3, 3))
    )
    variables = dt.init_vae(model, jax.random.PRNGKey(0))

    sf = ShardedFieldDeblender(
        (model, variables),
        field,
        mesh,
        cutout_size=23,
        nb_of_bands=3,
        cfg=PipelineConfig(
            cutout_size=23, nb_of_bands=3, tile_size=128, tile_overlap=32
        ),
    )
    print(
        f"bands: {sf.n_bands_mesh} x {sf.band_h} rows (+{sf.halo} halo) — "
        f"per-chip field residency "
        f"{(sf.band_h + 2 * sf.halo) * field.shape[1] * 3 * 4 / 1e6:.0f} MB"
    )

    det = DetectionConfig(thresh=25.0, background_box=32, detection_band=0)
    centers = sf.detect_objects(det)
    print(f"detected {len(centers)} sources (band-tiled, mesh-sharded)")

    timings = {}
    catalog, residual = sf.deblend_and_render(
        centers, optimise_positions=True, timings=timings
    )
    print(
        f"served {len(catalog)} sources; stages: "
        + " ".join(f"{k}={v:.2f}s" for k, v in timings.items())
    )
    print(f"residual rms: {np.sqrt(np.mean(residual**2)):.4f}")

    cat_it, resid_it = sf.iterative_deblend_and_render(
        det_cfg=det, max_iterations=3
    )
    print(
        f"iterative: {len(cat_it)} rows over "
        f"{int(np.max(cat_it.iteration)) + 1} iteration(s), "
        f"step mse {['%.2e' % m for m in sf.mse]}"
    )


if __name__ == "__main__":
    main()
