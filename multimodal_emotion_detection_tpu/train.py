"""Training entry point.

Usage (the Hydra-style CLI of /root/reference/src/train.py:458-653)::

    python -m multimodal_emotion_detection_tpu.train \
        [--config configs/base.yaml] [--resume] \
        training.learning_rate=5e-4 model.encoders.audio.hidden_dim=512

Flow parity with the reference main(): print config -> seed -> loaders ->
model + parameter counts -> fit (early stopping + checkpoints) -> test best
-> IF fusion_type is an uncertainty alias: calibration metrics, reliability
diagram, experiments/uncertainty.json; ELSE: copy best.ckpt + results.json.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from multimodal_emotion_detection_tpu.config import (
    Config,
    config_to_dict,
    config_to_yaml,
    load_config,
    snapshot_config,
)

_UNCERTAINTY_ALIASES = {
    "uncertainty", "uwf", "uncertainty_weighted", "uncertainty_weighted_late",
}


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native multimodal emotion detection training"
    )
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config (defaults to built-in base config)")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from last.ckpt if present")
    parser.add_argument("overrides", nargs="*",
                        help="key.path=value config overrides")
    return parser.parse_args(argv)


def run(config: Config, overrides=None, resume: bool = False) -> dict:
    from multimodal_emotion_detection_tpu.utils.runtime import setup_from_config

    setup_from_config(config)


    from multimodal_emotion_detection_tpu.data.loader import create_dataloaders
    from multimodal_emotion_detection_tpu.training.evaluate import (
        class_names_for,
        confusion_matrix,
        macro_f1,
        save_confusion_matrix,
        write_results_json,
        write_uncertainty_json,
    )
    from multimodal_emotion_detection_tpu.training.loop import Trainer
    from multimodal_emotion_detection_tpu.uncertainty.calibration import (
        CalibrationMetrics,
        per_bin_accuracy,
    )

    print("=" * 80)
    print("Configuration:")
    print(config_to_yaml(config))
    print("=" * 80)

    save_dir = Path(config.experiment.save_dir) / config.experiment.name
    save_dir.mkdir(parents=True, exist_ok=True)
    snapshot_config(config, save_dir, overrides)

    print("\nCreating dataloaders...")
    train_loader, val_loader, test_loader = create_dataloaders(
        dataset_name=config.dataset.name,
        data_dir=config.dataset.data_dir,
        modalities=config.dataset.modalities,
        batch_size=config.dataset.batch_size,
        num_workers=config.dataset.num_workers,
        modality_dropout=config.training.augmentation.modality_dropout,
        seed=config.seed,
        device_resident=config.dataset.device_resident,
        num_samples=config.dataset.num_samples,
        num_samples_eval=config.dataset.num_samples_eval,
        modality_dim=config.dataset.modality_dim,
        sequence_length=config.dataset.sequence_length,
        num_classes=config.dataset.num_classes,
        mmap=config.dataset.mmap,
    )
    print(f"Train batches: {len(train_loader)}")
    print(f"Val batches: {len(val_loader)}")
    print(f"Test batches: {len(test_loader)}")

    print("\nCreating model...")
    trainer = Trainer(config, save_dir=save_dir)
    trainer._build(train_loader)
    print(f"Total parameters: {trainer.num_params:,}")

    print("\nStarting training...")
    trainer.fit(train_loader, val_loader, resume=resume)

    print("\nTesting best model...")
    best_state = trainer.load_best()
    best_path = trainer.checkpoints.best_model_path
    print(f"Loading best model from: {best_path}")
    test_metrics, logits, preds, labels = trainer.test(
        test_loader, state=best_state
    )
    for name, value in test_metrics.items():
        print(f"{name}: {value:.4f}")
    # Lightning's trainer.test logs a final test row into the same CSV
    # (reference metrics.csv columns test/loss, test/acc, test/acc_agg)
    import jax as _jax

    final_step = int(_jax.device_get(trainer.state.step))
    trainer.csv_logger.log_metrics(dict(test_metrics), step=final_step)

    # Confusion matrix artifacts (ref train.py:282-397). Metrics are
    # computed on every process (identical global arrays); only process 0
    # writes files in a multi-process run (shared save_dir).
    primary = trainer.is_primary
    cm = confusion_matrix(labels, preds, config.dataset.num_classes)
    if primary:
        save_confusion_matrix(
            cm, save_dir,
            class_names_for(config.dataset.name, config.dataset.num_classes),
        )
        print(f"Saved confusion matrix to {save_dir / 'confusion_matrix.npy'}")
    test_metrics["test/macro_f1"] = macro_f1(cm)

    results = dict(test_metrics)
    if config.model.fusion_type.lower() in _UNCERTAINTY_ALIASES:
        print("\nComputing calibration metrics (uncertainty fusion detected)...")
        num_bins = config.evaluation.num_calibration_bins
        nll = CalibrationMetrics.negative_log_likelihood(logits, labels)
        probs = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs /= probs.sum(axis=-1, keepdims=True)
        confs = probs.max(axis=-1)
        ece = CalibrationMetrics.expected_calibration_error(
            confs, preds, labels, num_bins=num_bins
        )
        bins_list, acc_per_bin = per_bin_accuracy(confs, preds, labels, num_bins)
        if primary:
            CalibrationMetrics.reliability_diagram(
                confs, preds, labels, num_bins=num_bins,
                save_path=str(Path("./analysis") / "calibration_diagram.png"),
            )
            print("✓ Reliability diagram created")
            out = write_uncertainty_json(
                Path(config.outputs.experiments_dir),
                config.dataset.name,
                ece, nll, bins_list, acc_per_bin,
            )
            print(f"Saved uncertainty report to: {out}")
        results.update({"ece": ece, "nll": nll})
    elif primary:
        best_copy = trainer.checkpoints.copy_best(save_dir / "best.ckpt")
        if best_copy:
            print(f"Copied best checkpoint to: {best_copy}")
        results_file = write_results_json(
            save_dir,
            best_path,
            trainer.checkpoints.best_model_score,
            config_to_dict(config),
        )
        print(f"\nTraining complete! Results saved to: {results_file}")
        print(f"Best model: {best_path}")
        print(f"Best validation loss: {trainer.checkpoints.best_model_score:.4f}")

    results["best_val_loss"] = float(trainer.checkpoints.best_model_score)
    return results


def main(argv=None):
    args = parse_args(argv)
    config = load_config(args.config, args.overrides)
    return run(config, overrides=args.overrides, resume=args.resume)


if __name__ == "__main__":
    main(sys.argv[1:])
