"""Checkpointing: Orbax-backed best-validation saving and weight loading.

Reference behavior being mirrored (training/train.py:42-75, model/model.py:262-266):
two ModelCheckpoints per stage — best-by-val_mse and best-by-val_loss,
weights only, checked every epoch — saved under
``<weights_dir>/<survey>/<vae_or_deblender>/<monitor>/``; restore picks the
latest checkpoint under ``<weights_dir>/<survey>``.

We store the full variables pytree (params + batch_stats) with Orbax, which
scales to sharded multi-host arrays for free.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "default_weights_dir",
    "BestValCheckpoint",
    "define_callbacks",
    "save_weights",
    "load_weights",
    "load_deblender",
]

_PKG_ROOT = Path(__file__).resolve().parent.parent


def default_weights_dir() -> Path:
    """Packaged weights dir, like pkg_resources debvader/data/weights."""
    return _PKG_ROOT / "data" / "weights"


def _to_save(variables: Any):
    return jax.tree_util.tree_map(np.asarray, variables)


def save_weights(path: str | os.PathLike, variables: Any) -> None:
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_save(variables), force=True)


def load_weights_from(path: str | os.PathLike) -> Any:
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


class BestValCheckpoint:
    """Keras-ModelCheckpoint equivalent: save when the monitored validation
    metric improves (save_best_only=True, mode='min', save_freq='epoch')."""

    def __init__(self, directory: str | os.PathLike, monitor: str, verbose: int = 1):
        self.directory = Path(directory)
        self.monitor = monitor
        self.best = np.inf
        self.verbose = verbose

    def on_epoch_end(self, epoch: int, logs: dict, state) -> None:
        current = logs.get(self.monitor)
        if current is None:
            return
        if current < self.best:
            if self.verbose:
                print(
                    f"epoch {epoch + 1}: {self.monitor} improved "
                    f"{self.best:.5f} -> {current:.5f}, saving to {self.directory}"
                )
            self.best = current
            save_weights(
                self.directory / "ckpt",
                {"params": state.params, "batch_stats": state.batch_stats},
            )


def define_callbacks(
    vae_or_deblender: str, survey_name: str, weights_dir=None
) -> list[BestValCheckpoint]:
    """Two best-val callbacks, like reference define_callbacks
    (training/train.py:42-75)."""
    base = Path(weights_dir or default_weights_dir()) / str(survey_name) / str(
        vae_or_deblender
    )
    return [
        BestValCheckpoint(base / "val_mse", monitor="val_mse"),
        BestValCheckpoint(base / "val_loss", monitor="val_loss"),
    ]


def _candidate_ckpts(survey_dir: Path):
    """Checkpoint dirs under a survey dir, newest first (tf.train.
    latest_checkpoint equivalent)."""
    if not survey_dir.exists():
        return []
    found = [p for p in survey_dir.rglob("ckpt") if p.is_dir()]
    # Deterministic order: newest mtime first, ties broken by preferring the
    # val_loss monitor dir, then lexicographic path (the reference's
    # tf.train.latest_checkpoint reads a single marker file, so ties can't
    # happen there; here two monitors may save in the same epoch).
    return sorted(
        found,
        key=lambda p: (-p.stat().st_mtime, p.parent.name != "val_loss", str(p)),
    )


def save_train_state(path: str | os.PathLike, state) -> None:
    """Full restartability (SURVEY.md §5 'failure detection' build item):
    params + BN stats + optimizer moments + step + rng, so an interrupted
    run resumes bit-exact (the reference only ever saves weights)."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_save(payload), force=True)


def restore_train_state(path: str | os.PathLike, state):
    """Restore into an existing TrainState template (same model/optimizer)."""
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, _to_save(template))
    return state.replace(
        params=jax.tree_util.tree_map(jax.numpy.asarray, restored["params"]),
        batch_stats=jax.tree_util.tree_map(
            jax.numpy.asarray, restored["batch_stats"]
        ),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.numpy.asarray(x) if hasattr(x, "shape") else x,
            restored["opt_state"],
        ),
        step=jax.numpy.asarray(restored["step"]),
        rng=jax.numpy.asarray(restored["rng"]),
    )


def load_weights(survey: str, weights_dir=None) -> Any:
    """Restore the latest variables pytree for a survey."""
    survey_dir = Path(weights_dir or default_weights_dir()) / survey
    candidates = _candidate_ckpts(survey_dir)
    if not candidates:
        raise FileNotFoundError(
            f"no checkpoint found for survey {survey!r} under {survey_dir}"
        )
    return load_weights_from(candidates[0])


def load_deblender(
    survey: str,
    input_shape=(59, 59, 6),
    latent_dim: int = 32,
    filters=(32, 64, 128, 256),
    kernels=(3, 3, 3, 3),
    return_encoder_decoder_z: bool = False,
    weights_dir=None,
    dtype: str = "float32",
    decoder_f32_stages: int = 0,
    matmul_precision: str | None = None,
    flux_calibration: bool = False,
):
    """Build the VAE and load survey weights (reference model/model.py:221-271).

    Returns (model, variables); with ``return_encoder_decoder_z`` the bound
    encode/decode callables are returned too (the reference returns separate
    Keras models — here they are methods of one module).

    ``flux_calibration=True`` measures the built model's per-band flux gain
    against its own HIGHEST-precision forward and attaches the correction
    (utils/flux_cal.py) — the fidelity serving mode is
    ``matmul_precision='high', flux_calibration=True``
    (config.fidelity_serving_config).
    """
    from debvader_tpu.config import ModelConfig
    from debvader_tpu.models.vae import DeblenderVAE

    # Production entry points pay compiles in the minutes without the
    # persistent cache (BASELINE.md r4 cold-start table: 20.4 -> 11.5 s);
    # enable it best-effort here so every loader-based serving process
    # benefits.  Opt out with DEBVADER_NO_COMPILE_CACHE=1.
    import os

    if not os.environ.get("DEBVADER_NO_COMPILE_CACHE"):
        from debvader_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()

    cfg = ModelConfig(
        stamp_size=input_shape[0],
        nb_of_bands=input_shape[-1],
        latent_dim=latent_dim,
        filters=tuple(filters),
        kernels=tuple(kernels),
        dtype=dtype,
        decoder_f32_stages=decoder_f32_stages,
        matmul_precision=matmul_precision,
    )
    model = DeblenderVAE(cfg)
    variables = load_weights(survey, weights_dir=weights_dir)
    variables = jax.tree_util.tree_map(jax.numpy.asarray, variables)
    if flux_calibration:
        from debvader_tpu.utils.flux_cal import attach_flux_calibration

        variables = attach_flux_calibration(model, variables)
    if return_encoder_decoder_z:
        def encode(x):
            return model.apply(variables, x, method=lambda m, v: m.encode(v))

        def decode(z):
            return model.apply(variables, z, method=lambda m, v: m.decode(v))

        return model, variables, encode, decode
    return model, variables
