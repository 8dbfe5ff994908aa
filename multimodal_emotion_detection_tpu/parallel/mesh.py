"""Device mesh construction: axes ('data', 'model').

The reference is strictly single-device (`accelerator="gpu", devices=1`,
/root/reference/src/train.py:535-536; no torch.distributed anywhere —
SURVEY.md §2).  Here multi-chip is first-class: one 2-axis
``jax.sharding.Mesh`` covers data parallelism (batch axis, gradient psum
over ICI inserted by XLA) and tensor parallelism (large parameter matrices
sharded over 'model').  On multi-host slices, call
``jax.distributed.initialize()`` before building the mesh (no-op here).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.  data_parallel=-1 uses all devices
    left after the model axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model_parallel = max(1, int(model_parallel))
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    if data_parallel in (-1, 0):
        data_parallel = n // model_parallel
    used = data_parallel * model_parallel
    if used > n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} needs {used} devices, "
            f"have {n}"
        )
    grid = np.asarray(devices[:used]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(parallel_cfg, devices: Optional[Sequence] = None) -> Mesh:
    return make_mesh(
        data_parallel=parallel_cfg.data_parallel,
        model_parallel=parallel_cfg.model_parallel,
        devices=devices,
    )
