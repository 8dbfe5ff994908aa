"""Sharding rules: how the TrainState and batches lay out over the mesh.

Scaling-book recipe: pick a mesh, annotate shardings on the inputs, let
XLA's SPMD partitioner insert the collectives (gradient psum over 'data',
activation all-gathers over 'model'), profile, iterate.

Rules here:
* **Batch**: leading dim sharded over 'data' (each device gathers its batch
  shard from its dataset replica — the input pipeline needs no ICI).
* **Parameters**: replicated over 'data'; a parameter matrix is sharded
  over 'model' on its largest dimension that is divisible by the model-axis
  size and at least ``min_shard_dim`` wide (so tiny biases/LayerNorms stay
  replicated and only MXU-relevant matrices split — Megatron-style TP
  without a torch.distributed analogue in sight).
* **Optimizer state**: follows its parameter (tree_map over the optax
  state with the same rule).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_emotion_detection_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over 'data', everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _spec_for_param(shape, model_size: int, min_shard_dim: int) -> P:
    if model_size <= 1 or len(shape) == 0:
        return P()
    # largest shardable dim wins; prefer later dims on ties (output features)
    best = None
    for axis in range(len(shape)):
        dim = shape[axis]
        if dim >= min_shard_dim and dim % model_size == 0:
            if best is None or dim >= shape[best]:
                best = axis
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = MODEL_AXIS
    return P(*spec)


def param_shardings(params: Any, mesh: Mesh, min_shard_dim: int = 256) -> Any:
    model_size = mesh.shape[MODEL_AXIS]

    def leaf_sharding(leaf):
        shape = np.shape(leaf)
        return NamedSharding(mesh, _spec_for_param(shape, model_size,
                                                   min_shard_dim))

    return jax.tree_util.tree_map(leaf_sharding, params)


def shard_state(state: Any, mesh: Mesh, min_shard_dim: int = 256) -> Any:
    """Device_put a TrainState with TP param sharding (opt state follows
    params; scalars replicated)."""
    shardings = state_shardings(state, mesh, min_shard_dim)
    return jax.device_put(state, shardings)


def state_shardings(state: Any, mesh: Mesh, min_shard_dim: int = 256) -> Any:
    """Sharding pytree matching a TrainState structure."""
    model_size = mesh.shape[MODEL_AXIS]

    def leaf_sharding(leaf):
        shape = np.shape(leaf)
        return NamedSharding(
            mesh, _spec_for_param(shape, model_size, min_shard_dim)
        )

    return jax.tree_util.tree_map(leaf_sharding, state)
