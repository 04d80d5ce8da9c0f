"""Device-mesh construction and sharding rules.

Scale-out model (SURVEY.md §2 parallelism table; new capability vs the
single-stream reference): utterance-level DATA parallelism. The stream/batch
axis is sharded over a 1-D ``data`` mesh spanning all chips (and hosts);
model parameters are replicated (the ~2M-param model is far below one
chip's HBM). No collectives on the hot path — only metric reductions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch axis split across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated arrays (model parameters, DFT bases)."""
    return NamedSharding(mesh, P())


def shard_state(mesh: Mesh, state, axis_name: str = DATA_AXIS):
    """Place an engine state pytree with the leading (batch) axis sharded."""
    sharding = shard_batch(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), state)


__all__ = ["DATA_AXIS", "make_mesh", "shard_batch", "replicate", "shard_state"]
