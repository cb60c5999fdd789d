from debvader_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_variables,
)
from debvader_tpu.parallel.sharded import (
    create_sharded_train_state,
    make_sharded_apply,
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
    shard_train_state,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_variables",
    "create_sharded_train_state",
    "make_sharded_apply",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "shard_batch",
    "shard_train_state",
]
