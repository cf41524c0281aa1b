"""Parallelism: device meshes, sharded data placement, distributed init.

The capability surface needs only data parallelism (SURVEY.md section 2.3:
models are ~2-4M params, graphs fit one chip); TP/PP/SP/EP are intentionally
out of scope.  Everything here also runs on a virtual CPU mesh.
"""

from pamnet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    make_dp_eval_step,
    initialize_distributed,
)
from pamnet_tpu.train.loop import make_dp_train_step, stack_microbatches

__all__ = [
    "make_mesh",
    "shard_batch",
    "make_dp_eval_step",
    "initialize_distributed",
    "make_dp_train_step",
    "stack_microbatches",
]
