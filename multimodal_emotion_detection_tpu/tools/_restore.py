"""Shared checkpoint-restore scaffold for the serving CLIs.

predict / quantize (and any future eval tool) need the same recipe:
build the split loaders from the config, shape an init template from the
split's actual rows (``min(batch_size, num_samples)`` — splits smaller
than a batch crash a batch-sized template; regression
tests/test_train.py::test_predict_cli_mc_dropout_small_split), and
restore the checkpoint onto it.  One copy here so fixes don't have to be
hand-propagated across tools.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple


def restore_for_eval(
    config, checkpoint, split: str = "test"
) -> Tuple[Any, Any, Dict[str, Any], Dict[str, Any]]:
    """-> ``(model, state, meta, loaders)`` with ``loaders`` keyed by
    split name; the init template is shaped from ``split``'s rows."""
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.data.loader import (
        create_dataloaders,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.checkpoints import (
        restore_checkpoint,
    )
    from multimodal_emotion_detection_tpu.training.optim import (
        build_optimizer,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
    )

    loaders = dict(zip(
        ("train", "val", "test"),
        create_dataloaders(
            dataset_name=config.dataset.name,
            data_dir=config.dataset.data_dir,
            modalities=config.dataset.modalities,
            batch_size=config.dataset.batch_size,
            seed=config.seed,
            num_samples=config.dataset.num_samples,
            num_samples_eval=config.dataset.num_samples_eval,
            num_classes=config.dataset.num_classes,
            modality_dim=config.dataset.modality_dim,
            sequence_length=config.dataset.sequence_length,
        ),
    ))
    loader = loaders[split]
    model = classifier_from_config(config)
    tx, _ = build_optimizer(config.training,
                            steps_per_epoch=max(1, len(loader)))
    feats_all, _ = loader.device_arrays()
    b = min(loader.batch_size, loader.num_samples)
    sample = {m: a[:b] for m, a in feats_all.items()}
    template = create_train_state(
        model, tx, sample,
        jnp.ones((b, loader.arrays.num_modalities), jnp.float32),
        jax.random.PRNGKey(config.seed),
    )
    state, meta = restore_checkpoint(Path(checkpoint), template)
    return model, state, meta, loaders
