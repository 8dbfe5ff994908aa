"""Row-sharded device-resident splits: data loading that scales past one
host's RAM/HBM.

The default device-resident path replicates the whole split on every
device (fine on one chip; on a pod it multiplies HBM cost by the data-
axis size and requires every host to materialize the full dataset).
This module shards the SPLIT's rows over the 'data' axis instead:

* each data shard holds a contiguous block of rows (wrap-padded to an
  equal block size);
* epoch batch indices are built PER SHARD — segment j of every batch
  contains LOCAL indices into shard j's block, so under ``shard_map``
  each device gathers exclusively from its own rows.  No collective
  touches the input pipeline (scaling-book rule: batch over 'data', data
  loading host-local);
* on a multi-process runtime each process materializes only the rows its
  addressable devices own (``jax.make_array_from_process_local_data``);
  single-process placement is one sharded ``device_put``.

Used by ``parallel.strategy='shardmap_dp'`` + ``parallel.shard_data_rows``
(the GSPMD gather would instead all-gather the operand, defeating the
point — so the row-sharded mode is shard_map-only by construction).

Shuffling semantics differ from the replicated path by design: the
permutation is per-shard (each device samples from its own rows), the
multi-host-correct equivalent of the reference's single-permutation
shuffle.  Every real row is still visited exactly once per epoch
(valid-masked wrap padding, same contract as MultimodalLoader).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_emotion_detection_tpu.parallel.mesh import DATA_AXIS


def split_row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows of the split over 'data'; feature dims replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def rows_per_shard(n_rows: int, data_size: int) -> int:
    return math.ceil(n_rows / data_size)


def place_row_sharded(
    features: Dict[str, np.ndarray],
    labels: np.ndarray,
    mesh: Mesh,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Place a split with rows sharded over the mesh's 'data' axis.

    Rows are wrap-padded to ``rows_per * data_size`` (the per-shard valid
    counts from :func:`shard_local_epoch_indices` mask the padding out of
    every loss/metric).

    Construction is per-device-block: for each device this process
    addresses, only THAT shard's rows are materialized (fancy-indexing an
    ``np.memmap``-backed split reads just those pages off disk) and placed
    directly; the global array is assembled with
    ``jax.make_array_from_single_device_arrays``.  Consequences:

    * host RAM never holds the full (padded) split — peak host cost is
      one shard block at a time (pair with ``dataset.mmap=true``);
    * on a multi-process runtime each process touches only the row range
      its addressable devices own — the pod-scale loading path
      (SURVEY.md §5 'Distributed'), with no code fork vs single process.
    """
    data_size = mesh.shape[DATA_AXIS]
    n_real = labels.shape[0]
    n_padded = rows_per_shard(n_real, data_size) * data_size
    sharding = split_row_sharding(mesh)

    def place(arr):
        arr = np.asarray(arr) if not isinstance(arr, np.memmap) else arr
        global_shape = (n_padded,) + arr.shape[1:]
        blocks = []
        for dev, idxs in sharding.addressable_devices_indices_map(
            global_shape
        ).items():
            row_sl = idxs[0]
            start = 0 if row_sl.start is None else row_sl.start
            stop = global_shape[0] if row_sl.stop is None else row_sl.stop
            rows = np.arange(start, stop) % n_real  # wrap-pad
            blocks.append(jax.device_put(arr[rows], dev))
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, blocks
        )

    placed = {m: place(a) for m, a in features.items()}
    return placed, place(np.asarray(labels).astype(np.int32, copy=False))


def shard_local_epoch_indices(
    n_real: int,
    data_size: int,
    batch_size: int,
    epoch: int,
    seed: int,
    shuffle: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-shard LOCAL gather indices + valid mask for one epoch.

    Returns ``(idx, valid)`` of shape (num_batches, batch_size).  Segment
    j (length batch_size // data_size) of each batch indexes shard j's
    local block.  Each shard's real rows appear exactly once with
    valid=1; wrap-padding rows carry valid=0 so metrics stay exact.
    """
    if batch_size % data_size != 0:
        raise ValueError(
            f"batch_size {batch_size} not divisible by data axis {data_size}"
        )
    seg = batch_size // data_size
    rows_per = rows_per_shard(n_real, data_size)
    num_batches = math.ceil(rows_per / seg)
    total = num_batches * seg

    idx = np.empty((num_batches, batch_size), dtype=np.int32)
    valid = np.zeros((num_batches, batch_size), dtype=np.float32)
    for j in range(data_size):
        # rows this shard actually owns (tail shard may hold wrap-padded
        # duplicates of early rows; those are never marked valid)
        real_j = max(0, min(rows_per, n_real - j * rows_per))
        if shuffle:
            rng = np.random.RandomState(
                (seed * 1_000_003 + epoch * 7919 + j) % (2**31)
            )
            order = rng.permutation(max(real_j, 1))
        else:
            order = np.arange(max(real_j, 1))
        order = np.resize(order, total).astype(np.int32)
        v = np.zeros((total,), dtype=np.float32)
        v[:real_j] = 1.0
        cols = slice(j * seg, (j + 1) * seg)
        idx[:, cols] = order.reshape(num_batches, seg)
        valid[:, cols] = v.reshape(num_batches, seg)
    return idx, valid
