"""Mesh construction and sharded placement utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import GraphBatch
from pamnet_tpu.models import apply_pamnet
from pamnet_tpu.train.loop import make_mesh  # canonical (validates count)

__all__ = [
    "make_mesh", "initialize_distributed", "shard_batch", "make_dp_eval_step",
]


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry: thin wrapper over ``jax.distributed.initialize``.
    After it runs on every host, ``jax.devices()`` spans the full slice and
    the same mesh/shard_map programs scale across DCN."""
    jax.distributed.initialize(**kwargs)


def shard_batch(batches: list[GraphBatch], mesh: Mesh, axis: str = "dp"):
    """Stack D same-shape microbatches and place them sharded over the mesh
    (each device holds exactly its own microbatch — no replication)."""
    stacked = jax.tree.map(lambda *xs: np.stack(xs, 0), *batches)
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def make_dp_eval_step(cfg: PAMNetConfig, mesh: Mesh, axis: str = "dp"):
    """Data-parallel forward: batch with leading device axis D -> stacked
    (D, G) predictions (graph masks decode validity on host)."""

    def shard_fwd(params, batch: GraphBatch):
        batch = jax.tree.map(lambda x: x[0], batch)
        pred = apply_pamnet(params, batch, cfg)
        return pred[None]

    fn = shard_map(
        shard_fwd, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis)
    )
    return jax.jit(fn)
