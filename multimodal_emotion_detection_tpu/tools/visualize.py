"""Attention visualization CLI: cross-modal fusion weights from a
checkpoint.

    python -m multimodal_emotion_detection_tpu.tools.visualize \
        --checkpoint outputs/<run>/best.ckpt [--out attention.png] \
        model.train_fusion=library model.fusion_type=hybrid [overrides...]

Runs the hybrid fusion with ``return_attention`` over one test batch and
renders the modality x modality heatmap (the reference ships
``visualize_attention`` at attention.py:551-602 with no CLI surface).
For non-hybrid configs it falls back to plotting the per-modality fusion
weights where available.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Attention visualization")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--out", default="attention.png")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from multimodal_emotion_detection_tpu.config import load_config
    from multimodal_emotion_detection_tpu.utils.runtime import setup_from_config

    config = load_config(args.config, args.overrides)
    setup_from_config(config)

    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.data.loader import create_dataloaders
    from multimodal_emotion_detection_tpu.models.attention import (
        visualize_attention,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.checkpoints import (
        restore_checkpoint,
    )
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
    )

    _, _, test_loader = create_dataloaders(
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
    )
    model = classifier_from_config(config)
    tx, _ = build_optimizer(config.training, steps_per_epoch=1)
    feats_all, _ = test_loader.device_arrays()
    b = min(test_loader.batch_size, test_loader.num_samples)
    batch = {m: a[:b] for m, a in feats_all.items()}
    mask = jnp.ones((b, test_loader.arrays.num_modalities), jnp.float32)
    template = create_train_state(
        model, tx, batch, mask, jax.random.PRNGKey(config.seed)
    )
    state, _ = restore_checkpoint(Path(args.checkpoint), template)

    variables = {"params": state.params, **state.model_state}
    modalities = list(config.dataset.modalities)

    logits, aux = model.apply(variables, batch, mask,
                              deterministic=True, return_aux=True)
    if (
        config.model.train_fusion == "library"
        and config.model.fusion_type == "hybrid"
    ):
        # re-run the hybrid fusion on the encoded features to obtain the
        # per-modality cross-attention maps
        from multimodal_emotion_detection_tpu.models.fusion import (
            HybridFusion,
        )

        fusion = HybridFusion(
            modality_dims={m: config.model.output_dim for m in modalities},
            hidden_dim=config.model.hidden_dim,
            num_classes=config.dataset.num_classes,
            num_heads=config.model.num_heads,
            dropout=config.model.dropout,
        )
        _, info = fusion.apply(
            {"params": state.params["fusion"]},
            aux["encoded"], mask, return_attention=True,
        )
        rows = [
            np.asarray(info["per_modality_attention"][m]).mean(axis=(0, 1, 2))
            for m in modalities
        ]
        attn = np.stack(rows)  # (M, M): query modality x key modality
    else:
        weights = aux.get("fusion_weights")
        if weights is None:
            print("This configuration exposes no fusion attention; use "
                  "model.train_fusion=library model.fusion_type=hybrid")
            return None
        attn = np.asarray(weights).mean(axis=0, keepdims=True)

    visualize_attention(attn, modalities, save_path=args.out)
    print(f"Saved attention heatmap to {args.out}")
    return args.out


if __name__ == "__main__":
    main(sys.argv[1:])
