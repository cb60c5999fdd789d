"""Keras-checkpoint -> Flax-pytree weight mapping.

The bundled DC2 checkpoint stores the Keras object graph as
``layer_with_weights-{0,1}/layer_with_weights-N/{kernel,bias,alpha,gamma,...}``
(0 = encoder sub-model, 1 = decoder sub-model; verified against the ckpt
index — see SURVEY.md §2 row 19).  Tensor layouts line up exactly with our
modules by construction:

- Dense kernel (in, out)            -> flax Dense kernel
- Conv2D kernel (kh, kw, in, out)   -> flax Conv kernel
- Conv2DTranspose kernel (kh, kw, out, in) -> ConvTranspose2DTF kernel
  (we deliberately store TF layout, models/layers.py)
- PReLU alpha (per-element)         -> PReLU alpha
- BatchNorm gamma/beta              -> scale/bias (params)
  moving_mean/moving_variance       -> batch_stats mean/var

so the import is a pure relabeling — no transposes.

NOTE: this repo's snapshot strips the checkpoint's second data shard
(.MISSING_LARGE_BLOBS), which holds all 64 model tensors, so the pretrained
weights cannot be materialized here; the mapping is validated structurally
(every mapped name exists in the index with exactly the expected shape) and
round-trip (export->import is the identity).  On a machine with the full
checkpoint, ``import_reference_checkpoint`` restores it outright.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from debvader_tpu.config import ModelConfig

__all__ = [
    "keras_name_map",
    "import_from_tensors",
    "export_to_tensors",
    "import_reference_checkpoint",
]

_V = "/.ATTRIBUTES/VARIABLE_VALUE"


def keras_name_map(cfg: ModelConfig | None = None) -> dict[str, tuple]:
    """{tf_checkpoint_key: ("params"|"batch_stats", module_path...)}.

    Module paths address our DeblenderVAE variables pytree, e.g.
    ("params", "encoder", "Conv_0", "kernel").
    """
    cfg = cfg or ModelConfig()
    n_blocks = len(cfg.filters)
    m: dict[str, tuple] = {}

    def enc(i: int, leaf: str) -> str:
        return f"layer_with_weights-0/layer_with_weights-{i}/{leaf}{_V}"

    def dec(i: int, leaf: str) -> str:
        return f"layer_with_weights-1/layer_with_weights-{i}/{leaf}{_V}"

    # ---- encoder: BN, then per block [Conv, PReLU, Conv, PReLU], then
    # flatten-PReLU, Dense (model/model.py:79-98)
    m[enc(0, "gamma")] = ("params", "encoder", "BatchNorm_0", "scale")
    m[enc(0, "beta")] = ("params", "encoder", "BatchNorm_0", "bias")
    m[enc(0, "moving_mean")] = ("batch_stats", "encoder", "BatchNorm_0", "mean")
    m[enc(0, "moving_variance")] = ("batch_stats", "encoder", "BatchNorm_0", "var")
    idx = 1
    for b in range(n_blocks):
        for s in range(2):  # stride-1 conv then stride-2 conv
            conv = f"Conv_{2 * b + s}"
            prelu = f"PReLU_{2 * b + s}"
            m[enc(idx, "kernel")] = ("params", "encoder", conv, "kernel")
            m[enc(idx, "bias")] = ("params", "encoder", conv, "bias")
            idx += 1
            m[enc(idx, "alpha")] = ("params", "encoder", prelu, "alpha")
            idx += 1
    m[enc(idx, "alpha")] = ("params", "encoder", f"PReLU_{2 * n_blocks}", "alpha")
    idx += 1
    m[enc(idx, "kernel")] = ("params", "encoder", "Dense_0", "kernel")
    m[enc(idx, "bias")] = ("params", "encoder", "Dense_0", "bias")

    # ---- decoder: PReLU, Dense, PReLU, Dense, PReLU, per block
    # [ConvT s2, PReLU, ConvT s1, PReLU], final Conv (model/model.py:112-137)
    m[dec(0, "alpha")] = ("params", "decoder", "PReLU_0", "alpha")
    m[dec(1, "kernel")] = ("params", "decoder", "Dense_0", "kernel")
    m[dec(1, "bias")] = ("params", "decoder", "Dense_0", "bias")
    m[dec(2, "alpha")] = ("params", "decoder", "PReLU_1", "alpha")
    m[dec(3, "kernel")] = ("params", "decoder", "Dense_1", "kernel")
    m[dec(3, "bias")] = ("params", "decoder", "Dense_1", "bias")
    m[dec(4, "alpha")] = ("params", "decoder", "PReLU_2", "alpha")
    idx = 5
    for b in range(n_blocks):
        for s in range(2):
            convt = f"ConvTranspose2DTF_{2 * b + s}"
            prelu = f"PReLU_{3 + 2 * b + s}"
            m[dec(idx, "kernel")] = ("params", "decoder", convt, "kernel")
            m[dec(idx, "bias")] = ("params", "decoder", convt, "bias")
            idx += 1
            m[dec(idx, "alpha")] = ("params", "decoder", prelu, "alpha")
            idx += 1
    m[dec(idx, "kernel")] = ("params", "decoder", "Conv_0", "kernel")
    m[dec(idx, "bias")] = ("params", "decoder", "Conv_0", "bias")
    return m


def _set_path(tree: dict, path: tuple, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_path(tree: Any, path: tuple):
    node = tree
    for p in path:
        node = node[p]
    return node


def import_from_tensors(
    tensors: dict[str, np.ndarray],
    cfg: ModelConfig | None = None,
    strict: bool = True,
) -> dict:
    """Build the {params, batch_stats} variables pytree from TF-named
    tensors."""
    name_map = keras_name_map(cfg)
    out: dict = {"params": {}, "batch_stats": {}}
    missing = []
    for tf_key, path in name_map.items():
        if tf_key not in tensors:
            missing.append(tf_key)
            continue
        _set_path(out[path[0]], path[1:], np.asarray(tensors[tf_key]))
    if missing and strict:
        raise KeyError(f"{len(missing)} checkpoint tensors missing, e.g. {missing[:3]}")
    return out


def export_to_tensors(variables: dict, cfg: ModelConfig | None = None) -> dict:
    """Inverse mapping: our variables pytree -> TF-named tensor dict."""
    name_map = keras_name_map(cfg)
    out = {}
    for tf_key, path in name_map.items():
        out[tf_key] = np.asarray(_get_path(variables[path[0]], path[1:]))
    return out


def import_reference_checkpoint(
    ckpt_prefix: str, cfg: ModelConfig | None = None, strict: bool = True
) -> dict:
    """Read a reference TF checkpoint from disk and map it to our pytree."""
    from debvader_tpu.utils.tf_checkpoint import load_available_tensors

    tensors = load_available_tensors(ckpt_prefix)
    return import_from_tensors(tensors, cfg, strict=strict)
