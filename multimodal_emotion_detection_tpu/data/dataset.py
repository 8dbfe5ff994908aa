"""Fixed-shape multimodal array datasets.

TPU-native data model: a *split* is a dict of dense, fixed-shape numpy
arrays — exactly the on-disk layout the reference ETL writes
(``<data_dir>/<split>/{modality}.npy`` + ``labels.npy``; contract at
/root/reference/src/data.py:51-84 and dataprocessing.py:450-490).  There is
no per-sample Dataset/DataLoader indirection: batches are assembled by
array gathers, on-device when the split fits HBM (RAVDESS easily does:
~0.9 GB for all three splits).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List

import numpy as np


@dataclass
class MultimodalArrays:
    """One split: per-modality feature arrays + labels, row-aligned."""

    features: Dict[str, np.ndarray]  # each (N, ...) float32
    labels: np.ndarray  # (N,) int
    modalities: List[str]

    def __post_init__(self) -> None:
        n = len(self.labels)
        for name, arr in self.features.items():
            if arr.shape[0] != n:
                raise ValueError(
                    f"Modality '{name}' has {arr.shape[0]} rows, labels have {n}"
                )

    def __len__(self) -> int:
        return int(len(self.labels))

    @property
    def num_modalities(self) -> int:
        return len(self.modalities)

    def feature_shapes(self) -> Dict[str, tuple]:
        return {m: tuple(a.shape[1:]) for m, a in self.features.items()}

    def take(self, indices: np.ndarray) -> "MultimodalArrays":
        return MultimodalArrays(
            features={m: a[indices] for m, a in self.features.items()},
            labels=self.labels[indices],
            modalities=list(self.modalities),
        )


class ArrayDataset:
    """Loads the ``<data_dir>/<split>/{modality}.npy`` layout from disk."""

    def __init__(self, data_dir: str | Path, modalities: List[str], split: str):
        self.data_dir = Path(data_dir)
        self.split = split
        split_dir = self.data_dir / split
        features = {}
        for modality in modalities:
            path = split_dir / f"{modality}.npy"
            if not path.exists():
                raise FileNotFoundError(f"Modality file not found: {path}")
            features[modality] = np.load(path).astype(np.float32)
        labels_path = split_dir / "labels.npy"
        if not labels_path.exists():
            raise FileNotFoundError(f"Labels file not found: {labels_path}")
        labels = np.load(labels_path).astype(np.int32)
        self.arrays = MultimodalArrays(features, labels, list(modalities))

    def __len__(self) -> int:
        return len(self.arrays)
