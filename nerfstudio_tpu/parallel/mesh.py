"""Device mesh + sharding helpers — the distributed layer.

Replaces the reference's torch DDP/NCCL machinery (reference
scripts/train.py:90-226, utils/comms.py, pipelines/base_pipeline.py:279-282)
with the JAX SPMD recipe: one ``Mesh`` with a ``data`` axis, params
replicated, the ray batch sharded on ``data``. XLA inserts the gradient
all-reduce (psum) automatically; over ICI on a pod slice, over DCN across
slices (initialize with ``jax.distributed.initialize`` for multi-host).

The ray batch is the scaling axis (the models are tiny — SURVEY.md §2.10);
effective batch = num_devices x rays_per_device, matching the reference's
DDP semantics (engine/trainer.py:278-283)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (ray/batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(tree, mesh: Optional[Mesh]):
    """Constrain every leaf's leading axis to the data axis (inside jit)."""
    if mesh is None:
        return tree
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sh) if x is not None else None, tree
    )


def is_main_process() -> bool:
    """Rank-0 gating (reference utils/comms.py is_main_process)."""
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
