"""Cross-survey / cross-band-count weight transfer.

The reference's warm start (``from_survey``, training/train.py:145-154)
restores an *identical* weight tree, so a checkpoint trained on one band
count can never seed a model with another (its channel validation at
training/train.py:133-142 only checks the data, not the checkpoint).
BASELINE config 5 asks for exactly that: "band-count variants (Rubin 6-band
vs Euclid) with frozen-encoder latent reuse".

``transfer_band_count`` makes it a structural operation: every tensor whose
shape is band-independent (the entire latent head, all interior convs, the
big dense layers, every PReLU) carries over; the band-shaped tensors —
encoder input BatchNorm (scale/bias/mean/var, shape (B,)), encoder Conv_0
kernel (k, k, B, filters[0]), and the decoder's final Conv kernel/bias
(k, k, filters[0], 2B) / (2B,) — are freshly initialized for the target
band count.  Matching is by (path, shape), so the same function also
handles any other band-dependent leaf a config variant may introduce.

Typical use (the ``train_deblender(..., from_survey=...)`` path calls this
automatically on a band-count mismatch):

    vars6 = checkpoint.load_weights("dc2")           # 6-band checkpoint
    vars3 = transfer_band_count(vars6, ModelConfig(nb_of_bands=3))
    state = create_train_state(model3, cfg, variables=vars3, freeze="encoder")
"""

from __future__ import annotations

from typing import Any

import jax

from debvader_tpu.config import ModelConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae

__all__ = ["checkpoint_band_count", "transfer_band_count"]


def checkpoint_band_count(variables: Any) -> int:
    """Band count a variables pytree was trained for (the encoder's input
    BatchNorm is shaped (B,))."""
    return int(variables["params"]["encoder"]["BatchNorm_0"]["scale"].shape[0])


def _flatten(tree: Any) -> dict[tuple, Any]:
    return {
        tuple(path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def transfer_band_count(
    variables: Any,
    model_cfg: ModelConfig,
    rng: jax.Array | None = None,
    return_info: bool = False,
) -> Any:
    """Re-shape a checkpoint for ``model_cfg``'s band count.

    Returns a variables pytree for the target model where every leaf whose
    (path, shape) matches the source checkpoint is the source tensor and
    every band-shaped leaf is a fresh initialization (seeded by ``rng``).

    ``return_info=True`` additionally returns
    ``{"transferred": [paths], "reinitialized": [paths]}`` so callers/tests
    can assert exactly which tensors carried over.
    """
    model = DeblenderVAE(model_cfg)
    fresh = init_vae(model, rng if rng is not None else jax.random.PRNGKey(0))
    src = _flatten(variables)
    info = {"transferred": [], "reinitialized": []}

    def pick(path, fresh_leaf):
        s = src.get(tuple(path))
        if s is not None and tuple(s.shape) == tuple(fresh_leaf.shape):
            info["transferred"].append(jax.tree_util.keystr(path))
            return jax.numpy.asarray(s, fresh_leaf.dtype)
        info["reinitialized"].append(jax.tree_util.keystr(path))
        return fresh_leaf

    out = jax.tree_util.tree_map_with_path(pick, fresh)
    if not info["transferred"]:
        raise ValueError(
            "no tensor carried over — the checkpoint does not match the "
            "target architecture beyond its band count"
        )
    if return_info:
        return out, info
    return out
