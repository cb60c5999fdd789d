"""DC2 pretrained-weight fidelity harness.

BASELINE.json's fidelity clause: "<=1e-4 rel. flux error vs Keras weights" —
i.e. the imported reference checkpoint, run through this framework's VAE,
must reproduce the reference Keras model's deterministic (latent-mean)
forward on the bundled DC2 stamps.  This snapshot cannot execute the check
(the checkpoint's second data shard is stripped, reference
`.MISSING_LARGE_BLOBS`), so the harness is shipped as a *runnable artifact*:
on any machine with the full checkpoint,

    DEBVADER_TF_CKPT=/path/to/weights_noisy_v4.386--6.61.ckpt \
        python -m pytest tests/test_dc2_parity.py

or ``scripts/import_reference_weights.py --assert-parity`` proves or
falsifies the bound in one command.

The reference side comes from either (a) a precomputed outputs file
(``reference_outputs`` / env DEBVADER_REFERENCE_OUTPUTS: the (10, 59, 59, 6)
mean image from the Keras model, produced once with
``save_reference_outputs`` below on a TF machine), or (b) a live TF/TFP
forward through the reference's own model builder
(/root/reference/src/debvader/model/model.py:164-218) when tensorflow is
importable.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = [
    "bundled_dc2_stamps",
    "reference_forward_mean",
    "dc2_parity_check",
    "save_reference_outputs",
]

_REFERENCE_STAMPS = Path("/root/reference/src/debvader/data/dc2_imgs/imgs_dc2.npy")


def bundled_dc2_stamps() -> np.ndarray:
    """The 10 bundled DC2 stamps (10, 59, 59, 6) float32."""
    path = os.environ.get("DEBVADER_DC2_STAMPS", str(_REFERENCE_STAMPS))
    return np.load(path).astype(np.float32)


def reference_forward_mean(stamps: np.ndarray, ckpt_path: str) -> np.ndarray:
    """Deterministic Keras forward: decoder(z(stamps).mean()).mean().

    Requires tensorflow + tensorflow_probability and the reference package
    source (reference model builder at model/model.py:164-218).  Raises
    ImportError when TF is unavailable.
    """
    import sys

    ref_src = os.environ.get("DEBVADER_REFERENCE_SRC", "/root/reference/src")
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    from debvader.model.model import create_model_vae  # noqa: PLC0415

    net, encoder, decoder, z = create_model_vae(
        (59, 59, stamps.shape[-1]), 32, [32, 64, 128, 256], [3, 3, 3, 3]
    )
    net.load_weights(ckpt_path).expect_partial()
    z_mean = z(stamps).mean()
    dist = decoder(z_mean)
    return np.asarray(dist.mean())


def save_reference_outputs(ckpt_path: str, out_path: str) -> None:
    """One-time capture of the reference outputs on a TF machine, for
    machines that have the checkpoint but not TF."""
    np.save(out_path, reference_forward_mean(bundled_dc2_stamps(), ckpt_path))


def dc2_parity_check(
    ckpt_path: str,
    stamps: np.ndarray | None = None,
    reference_outputs: np.ndarray | str | None = None,
    tol: float = 1e-4,
) -> dict:
    """Import the reference checkpoint, run the bundled stamps, and compare
    against the Keras outputs.  Returns the measured error dict; raises
    AssertionError if the per-stamp relative flux error exceeds ``tol``.
    """
    import jax

    from debvader_tpu.config import ModelConfig
    from debvader_tpu.models.vae import DeblenderVAE
    from debvader_tpu.utils.weight_import import import_reference_checkpoint

    if stamps is None:
        stamps = bundled_dc2_stamps()
    if reference_outputs is None:
        reference_outputs = os.environ.get("DEBVADER_REFERENCE_OUTPUTS")
    if isinstance(reference_outputs, (str, Path)):
        reference_outputs = np.load(reference_outputs)
    if reference_outputs is None:
        reference_outputs = reference_forward_mean(stamps, ckpt_path)

    variables = import_reference_checkpoint(ckpt_path, strict=True)
    variables = jax.tree_util.tree_map(jax.numpy.asarray, variables)
    # matmul_precision='highest': on TPU the default precision rounds fp32
    # matmul inputs to bf16, which by itself can exceed the 1e-4 clause —
    # the fidelity check must measure the weights, not the MXU pass count
    # (scripts/bench_precision.py measures the ladder).
    model = DeblenderVAE(
        ModelConfig(nb_of_bands=stamps.shape[-1], matmul_precision="highest")
    )
    dist, _ = model.apply(variables, stamps, z_mode="mean")
    ours = np.asarray(dist.mean())

    flux_ours = ours.sum(axis=(1, 2, 3), dtype=np.float64)
    flux_ref = np.asarray(reference_outputs).sum(axis=(1, 2, 3), dtype=np.float64)
    rel_flux = np.abs(flux_ours - flux_ref) / np.maximum(np.abs(flux_ref), 1e-30)
    max_abs_pix = float(np.abs(ours - reference_outputs).max())
    result = {
        "max_rel_flux": float(rel_flux.max()),
        "rel_flux": rel_flux.tolist(),
        "max_abs_pix": max_abs_pix,
    }
    assert rel_flux.max() <= tol, (
        f"DC2 flux parity FAILED: max rel flux {rel_flux.max():.3e} > {tol:.1e} "
        f"(per-stamp: {np.round(rel_flux, 6).tolist()})"
    )
    return result
