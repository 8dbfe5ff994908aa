"""Batch iteration over multimodal splits, TPU-style.

Replaces the reference's torch DataLoader + 4 worker processes + custom
collate (/root/reference/src/data.py:191-294) with two complementary paths:

1. **Device-resident** (default): the whole split is transferred to HBM
   once; the jitted train step *gathers* each batch by index on-device, so
   steady-state training does zero host->device transfers.
2. **Host iteration**: `__iter__` yields `(features_dict, labels, mask)`
   batches (numpy-sliced then device_put), for eval loops and parity tests.

Shuffling is an epoch-seeded permutation (pure function of seed+epoch), and
the train loader's modality-dropout mask is generated from the same key
stream — the reference's per-worker `torch.rand` becomes explicit PRNG.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_emotion_detection_tpu.data.dataset import (
    ArrayDataset,
    MultimodalArrays,
)
from multimodal_emotion_detection_tpu.data.masking import modality_dropout_mask
from multimodal_emotion_detection_tpu.data.synthetic import synthetic_arrays


class MultimodalLoader:
    """Iterates fixed-size batches over one split."""

    def __init__(
        self,
        arrays: MultimodalArrays,
        batch_size: int,
        shuffle: bool = False,
        modality_dropout: float = 0.0,
        seed: int = 42,
        drop_last: bool = False,
        device_resident: bool = True,
    ):
        self.arrays = arrays
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.modality_dropout = float(modality_dropout)
        self.seed = int(seed)
        self.drop_last = drop_last
        self.device_resident = device_resident
        self.epoch = 0
        self._device_features: Optional[Dict[str, jnp.ndarray]] = None
        self._device_labels: Optional[jnp.ndarray] = None
        self._device_sharding = None

    # -- sizing ----------------------------------------------------------
    def __len__(self) -> int:
        n = len(self.arrays)
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    @property
    def num_samples(self) -> int:
        return len(self.arrays)

    @property
    def modalities(self) -> List[str]:
        return self.arrays.modalities

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    # -- device-resident path ---------------------------------------------
    def device_arrays(
        self, sharding=None
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """Transfer the full split to device (once) and cache it.

        The cache is keyed by ``sharding``: requesting a different sharding
        (e.g. Trainer.fit's replicated mesh sharding after an unsharded
        warm-up call) re-places the arrays instead of handing the jitted
        step mismatched operands that would be re-transferred every step.
        """
        if self._device_features is None or self._device_sharding is not sharding:
            put = (
                (lambda x: jax.device_put(x, sharding))
                if sharding is not None
                else jax.device_put
            )
            self._device_features = {
                m: put(a) for m, a in self.arrays.features.items()
            }
            self._device_labels = put(self.arrays.labels.astype(np.int32))
            self._device_sharding = sharding
        return self._device_features, self._device_labels

    def epoch_batch_indices(self, epoch: Optional[int] = None) -> np.ndarray:
        """(num_batches, batch_size) int32 gather indices for one epoch.

        The trailing partial batch (if any) is padded by *wrapping* indices;
        a separate `batch_valid` mask from :meth:`epoch_batch_valid` marks
        real rows so metrics stay exact while shapes stay static (one XLA
        compilation for every batch of the run).
        """
        epoch = self.epoch if epoch is None else epoch
        n = len(self.arrays)
        if self.shuffle:
            rng = np.random.RandomState((self.seed * 1_000_003 + epoch) % (2**31))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        num_batches = len(self)
        total = num_batches * self.batch_size
        if total > n:
            # cyclic wrap (handles splits smaller than one batch too);
            # epoch_batch_valid() zeroes positions >= n either way
            order = np.resize(order, total)
        else:
            order = order[:total]
        return order.reshape(num_batches, self.batch_size).astype(np.int32)

    def epoch_batch_valid(self) -> np.ndarray:
        """(num_batches, batch_size) 1.0 for real rows, 0.0 for wrap-padding."""
        n = len(self.arrays)
        num_batches = len(self)
        valid = np.ones((num_batches * self.batch_size,), dtype=np.float32)
        if num_batches * self.batch_size > n:
            valid[n:] = 0.0
        return valid.reshape(num_batches, self.batch_size)

    # -- host iteration path ------------------------------------------------
    def __iter__(
        self,
    ) -> Iterator[Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]]:
        indices = self.epoch_batch_indices(self.epoch)
        valid = self.epoch_batch_valid()
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), self.epoch)
        m = self.arrays.num_modalities
        for b in range(indices.shape[0]):
            idx = indices[b]
            features = {
                name: jnp.asarray(arr[idx])
                for name, arr in self.arrays.features.items()
            }
            labels = jnp.asarray(self.arrays.labels[idx].astype(np.int32))
            if self.modality_dropout > 0.0:
                key, sub = jax.random.split(key)
                mask = modality_dropout_mask(
                    sub, self.batch_size, m, self.modality_dropout
                )
            else:
                mask = jnp.ones((self.batch_size, m), dtype=jnp.float32)
            mask = mask * jnp.asarray(valid[b])[:, None]
            yield features, labels, mask


def create_dataloaders(
    dataset_name: str,
    data_dir: str,
    modalities: List[str],
    batch_size: int = 32,
    num_workers: int = 4,  # accepted for schema parity; unused (no host workers)
    modality_dropout: float = 0.0,
    seed: int = 42,
    device_resident: bool = True,
    **kwargs,
) -> Tuple[MultimodalLoader, MultimodalLoader, MultimodalLoader]:
    """Build train/val/test loaders.

    ``dataset_name == 'synthetic'`` routes to the synthetic generator
    (sized like /root/reference/src/data.py:238-257: val/test get
    ``num_samples_eval // 5`` rows); anything else loads the on-disk
    ``.npy`` layout.
    """
    if num_workers not in (0, 4):  # 4 == reference default (schema parity)
        print(
            f"[data] num_workers={num_workers} accepted for config-schema "
            "parity but has no effect: batches are gathered on-device from "
            "the HBM-resident split (no host worker processes)."
        )
    if dataset_name == "synthetic":
        num_samples = kwargs.get("num_samples", 10000)
        num_eval = kwargs.get("num_samples_eval", 2000) // 5
        num_classes = kwargs.get("num_classes", 5)
        dims = {m: kwargs.get("modality_dim", 32) for m in modalities}
        seq_len = kwargs.get("sequence_length", 100)
        splits = {
            "train": synthetic_arrays(
                num_samples, num_classes, dims, seq_len, "train", seed
            ),
            "val": synthetic_arrays(num_eval, num_classes, dims, seq_len, "val", seed),
            "test": synthetic_arrays(
                num_eval, num_classes, dims, seq_len, "test", seed
            ),
        }
    else:
        mmap = bool(kwargs.get("mmap", False))
        splits = {
            split: ArrayDataset(data_dir, modalities, split, mmap=mmap).arrays
            for split in ("train", "val", "test")
        }

    train_loader = MultimodalLoader(
        splits["train"],
        batch_size,
        shuffle=True,
        modality_dropout=modality_dropout,
        seed=seed,
        device_resident=device_resident,
    )
    val_loader = MultimodalLoader(
        splits["val"], batch_size, shuffle=False, seed=seed,
        device_resident=device_resident,
    )
    test_loader = MultimodalLoader(
        splits["test"], batch_size, shuffle=False, seed=seed,
        device_resident=device_resident,
    )
    return train_loader, val_loader, test_loader
