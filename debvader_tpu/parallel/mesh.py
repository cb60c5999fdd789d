"""Device meshes and sharding rules.

The reference is strictly single-device (SURVEY.md §2 preamble: no
tf.distribute / NCCL / MPI anywhere), so this component is new by design:
training and batched inference scale over a ``jax.sharding.Mesh`` with XLA
inserting the collectives (grad psum over 'data', all-gathers for the
tensor-sharded dense layers) on ICI.

Axes:
- ``data``: batch dimension — stamps for training/inference, tiles for
  full-field deblending.
- ``model``: tensor parallelism for the two dominant dense layers (the
  4096x560 encoder head and the 560x4096 decoder expansion hold ~55% of all
  parameters); their kernels are column-sharded so the matmul runs as a
  local shard followed by an ICI collective.  Conv layers stay replicated —
  at 59x59 stamps their weights are tiny and batch parallelism feeds the MXU
  better than spatial splits.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_variables",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    When the default backend exposes fewer than ``n_devices`` (e.g. a
    single tunneled TPU chip while the host CPU backend was split into N
    virtual devices via ``--xla_force_host_platform_device_count``), the
    mesh falls back to ``jax.devices('cpu')`` so multi-chip layouts stay
    testable on one machine.  Under-provisioning is an error, never a
    silent truncation.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= n_devices:
                devices = cpu
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested n_devices={n_devices} but only {len(devices)} "
                f"available (platform {devices[0].platform if devices else '?'})"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _dense_kernel_spec(path, leaf) -> P:
    """Column-shard the big dense kernels over 'model'; replicate the rest."""
    keys = [getattr(p, "key", None) for p in path]
    is_kernel = keys and keys[-1] == "kernel"
    if is_kernel and leaf.ndim == 2 and int(np.prod(leaf.shape)) >= 1 << 20:
        return P(None, MODEL_AXIS)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for the params: TP on heavy dense kernels."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _dense_kernel_spec(path, leaf)),
        params,
    )


def shard_variables(variables: Any, mesh: Mesh) -> Any:
    """Place a variables pytree on the mesh (params TP-sharded, stats
    replicated)."""
    shardings = {
        "params": param_shardings(variables["params"], mesh),
        "batch_stats": jax.tree_util.tree_map(
            lambda _: replicated(mesh), variables.get("batch_stats", {})
        ),
    }
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), variables, shardings
    )
