"""Multi-chip parallelism: mesh construction, shardings, sharded train steps."""

from ctc_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from ctc_tpu.parallel.steps import (
    shard_batch,
    replicate,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "shard_batch",
    "replicate",
    "make_sharded_train_step",
]
