"""Device-mesh utilities for stream-parallel codec execution.

Parallelism model (SURVEY.md §2.7): LC3plus frames are tiny and frame-serial
per stream, so ALL parallelism rides the stream axis. A 1-D ('streams',)
mesh spans every chip (and every host under jax.distributed); state lives
chip-local as [n_streams, ...] shards, frames advance in lock-step, and the
only collectives are metric reductions (psum) and stream migration
(ppermute / all_to_all) when rebalancing — all over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stream_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("streams",))


def shard_streams(mesh: Mesh) -> NamedSharding:
    """Sharding for [n_streams, ...] arrays: leading axis over the mesh."""
    return NamedSharding(mesh, P("streams"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(mesh: Mesh, tree):
    """Place a [B, ...] state pytree with the stream axis sharded."""
    sh = shard_streams(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
