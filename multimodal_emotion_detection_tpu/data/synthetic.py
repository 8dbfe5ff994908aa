"""Synthetic multimodal dataset — the repo's fast test fixture.

Semantics follow /root/reference/src/data.py:125-188: Gaussian sequences of
shape (N, sequence_length, dim) per modality, uniform random labels, and a
*split-dependent* seed (train=seed, val=seed+1, test=seed+2) so splits are
distinct but reproducible.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from multimodal_emotion_detection_tpu.data.dataset import MultimodalArrays

_SPLIT_OFFSETS = {"train": 0, "val": 1, "test": 2}


def synthetic_arrays(
    num_samples: int = 10000,
    num_classes: int = 5,
    modality_dims: Dict[str, int] | None = None,
    sequence_length: int = 100,
    split: str = "train",
    seed: int = 42,
) -> MultimodalArrays:
    if modality_dims is None:
        modality_dims = {"sensor1": 32, "sensor2": 32, "sensor3": 32}
    rng = np.random.RandomState(seed + _SPLIT_OFFSETS.get(split, 0))
    features = {
        modality: rng.randn(num_samples, sequence_length, dim).astype(np.float32)
        for modality, dim in modality_dims.items()
    }
    labels = rng.randint(0, num_classes, num_samples).astype(np.int32)
    return MultimodalArrays(features, labels, list(modality_dims.keys()))
