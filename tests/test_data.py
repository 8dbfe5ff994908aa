"""Data layer: synthetic fixture, loader batching, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_emotion_detection_tpu.data import (
    MultimodalLoader,
    create_dataloaders,
    modality_dropout_mask,
    simulate_missing_modalities,
    synthetic_arrays,
)
from multimodal_emotion_detection_tpu.data.dataset import ArrayDataset


def test_synthetic_shapes_and_split_seeds():
    train = synthetic_arrays(20, 5, {"a": 8, "b": 8}, 10, "train", seed=42)
    val = synthetic_arrays(20, 5, {"a": 8, "b": 8}, 10, "val", seed=42)
    assert train.features["a"].shape == (20, 10, 8)
    assert train.labels.shape == (20,)
    # split-dependent seeds -> distinct data (ref data.py:159-161)
    assert not np.allclose(train.features["a"], val.features["a"])
    # reproducible
    again = synthetic_arrays(20, 5, {"a": 8, "b": 8}, 10, "train", seed=42)
    np.testing.assert_array_equal(train.features["a"], again.features["a"])


def test_disk_dataset_layout(tmp_path):
    for split in ("train", "val", "test"):
        d = tmp_path / split
        d.mkdir()
        np.save(d / "audio.npy", np.zeros((4, 6, 1), np.float32))
        np.save(d / "labels.npy", np.arange(4))
    ds = ArrayDataset(tmp_path, ["audio"], "train")
    assert len(ds) == 4
    with pytest.raises(FileNotFoundError):
        ArrayDataset(tmp_path, ["video"], "train")


def test_loader_batches_and_wrap_padding():
    arrays = synthetic_arrays(10, 3, {"a": 4}, 5, "train")
    loader = MultimodalLoader(arrays, batch_size=4, shuffle=False)
    assert len(loader) == 3  # ceil(10/4)
    idx = loader.epoch_batch_indices(0)
    valid = loader.epoch_batch_valid()
    assert idx.shape == (3, 4)
    assert valid.sum() == 10  # 2 padded rows marked invalid
    assert valid[-1, -2:].sum() == 0
    batches = list(loader)
    assert len(batches) == 3
    feats, labels, mask = batches[0]
    assert feats["a"].shape == (4, 5, 4)
    assert labels.shape == (4,)
    assert mask.shape == (4, 1)


def test_loader_shuffle_is_epoch_deterministic():
    arrays = synthetic_arrays(16, 3, {"a": 4}, 5, "train")
    loader = MultimodalLoader(arrays, batch_size=4, shuffle=True, seed=7)
    i0 = loader.epoch_batch_indices(0)
    i0b = loader.epoch_batch_indices(0)
    i1 = loader.epoch_batch_indices(1)
    np.testing.assert_array_equal(i0, i0b)
    assert not np.array_equal(i0, i1)
    # every epoch is a permutation of all rows
    assert sorted(i0.ravel().tolist()) == list(range(16))


def test_create_dataloaders_synthetic_sizing():
    train, val, test = create_dataloaders(
        "synthetic", "", ["a", "b"], batch_size=8,
        num_samples=32, num_samples_eval=40, num_classes=4, modality_dim=6,
        sequence_length=5,
    )
    assert train.num_samples == 32
    assert val.num_samples == 8  # 40 // 5, ref data.py:247
    assert test.num_samples == 8


def test_modality_dropout_mask_guarantee():
    key = jax.random.PRNGKey(0)
    # brutal dropout: every modality would drop without the guarantee
    mask = modality_dropout_mask(key, 256, 3, dropout_prob=0.99)
    assert mask.shape == (256, 3)
    assert float(mask.sum(axis=1).min()) >= 1.0  # >=1 modality per row
    # p=0 -> all ones
    np.testing.assert_array_equal(
        modality_dropout_mask(key, 4, 2, 0.0), np.ones((4, 2))
    )


def test_modality_dropout_mask_rate():
    key = jax.random.PRNGKey(1)
    mask = modality_dropout_mask(key, 4096, 4, dropout_prob=0.3)
    keep_rate = float(mask.mean())
    assert 0.65 < keep_rate < 0.78  # ~0.7 plus the >=1 guarantee


def test_simulate_missing_modalities():
    feats = {
        "a": jnp.ones((3, 4)),
        "b": jnp.ones((3, 4)),
    }
    mask = jnp.ones((3, 2))
    out, new_mask = simulate_missing_modalities(feats, mask, missing_pattern=[0])
    np.testing.assert_array_equal(np.asarray(new_mask), [[1, 0]] * 3)
    assert float(jnp.abs(out["b"]).sum()) == 0.0
    assert float(jnp.abs(out["a"]).sum()) > 0.0


def test_loader_drop_last():
    arrays = synthetic_arrays(10, 3, {"a": 4}, 5, "train")
    loader = MultimodalLoader(arrays, batch_size=4, drop_last=True)
    assert len(loader) == 2
    idx = loader.epoch_batch_indices(0)
    assert idx.shape == (2, 4)
    assert loader.epoch_batch_valid().sum() == 8


def test_device_arrays_cached():
    arrays = synthetic_arrays(8, 3, {"a": 4}, 5, "train")
    loader = MultimodalLoader(arrays, batch_size=4)
    f1, l1 = loader.device_arrays()
    f2, l2 = loader.device_arrays()
    assert f1["a"] is f2["a"] and l1 is l2  # transferred exactly once


def test_loader_split_smaller_than_half_batch():
    """Splits smaller than batch_size/2 wrap cyclically (regression: the
    old concat-pad under-filled when total - n > n and reshape crashed)."""
    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader
    from multimodal_emotion_detection_tpu.data.synthetic import synthetic_arrays

    arrays = synthetic_arrays(12, 4, {"m": 6}, 5, "val", 0)
    loader = MultimodalLoader(arrays, batch_size=32, shuffle=False)
    idx = loader.epoch_batch_indices(0)
    assert idx.shape == (1, 32)
    np.testing.assert_array_equal(idx[0], np.resize(np.arange(12), 32))
    valid = loader.epoch_batch_valid()
    assert valid.shape == (1, 32)
    assert valid[0, :12].all() and not valid[0, 12:].any()
    batches = list(loader)
    assert len(batches) == 1
