"""Grid sweep driver: lr x model.dropout x modality_dropout.

In-process replacement for the reference's SLURM shell grid
(/root/reference/sweep.sh:27-29,78-179): runs the 3x2x2 grid sequentially,
tags each run ``lr{..}_drop{..}_mDrop{..}`` (same tag scheme), and harvests
results.json / confusion_matrix.{npy,png} / best.ckpt / metrics.csv plus a
``hyperparams.txt`` manifest into ``grid_sweep_results/<tag>/``.

    python -m multimodal_emotion_detection_tpu.tools.sweep \
        [--config base.yaml] [--out grid_sweep_results] [overrides...]
"""

from __future__ import annotations

import copy
import json
import shutil
import sys
from pathlib import Path
from typing import List, Sequence


def format_tag(lr: float, dropout: float, m_dropout: float) -> str:
    def fmt(x: float) -> str:
        return f"{x:g}".replace(".", "p").replace("-", "m")

    return f"lr{fmt(lr)}_drop{fmt(dropout)}_mDrop{fmt(m_dropout)}"


def run_sweep(
    base_config,
    learning_rates: Sequence[float] = (5e-4, 1e-3, 2e-3),
    dropouts: Sequence[float] = (0.0, 0.3),
    modality_dropouts: Sequence[float] = (0.0, 0.1),
    out_root: str = "grid_sweep_results",
    overrides: List[str] | None = None,
) -> List[dict]:
    from multimodal_emotion_detection_tpu.train import run as train_run

    out_dir = Path(out_root)
    out_dir.mkdir(parents=True, exist_ok=True)
    all_results = []
    total = len(learning_rates) * len(dropouts) * len(modality_dropouts)
    i = 0
    for lr in learning_rates:
        for dropout in dropouts:
            for m_drop in modality_dropouts:
                i += 1
                tag = format_tag(lr, dropout, m_drop)
                print(f"\n=== sweep {i}/{total}: {tag} ===")
                cfg = copy.deepcopy(base_config)
                cfg.training.learning_rate = lr
                cfg.model.dropout = dropout
                cfg.training.augmentation.modality_dropout = m_drop
                cfg.experiment.name = f"{base_config.experiment.name}_{tag}"

                result = train_run(cfg, overrides=overrides)
                result["tag"] = tag

                run_dir = (
                    Path(cfg.experiment.save_dir) / cfg.experiment.name
                )
                dest = out_dir / tag
                dest.mkdir(parents=True, exist_ok=True)
                for artifact in (
                    "results.json", "confusion_matrix.npy",
                    "confusion_matrix.png", "best.ckpt",
                ):
                    src = run_dir / artifact
                    if src.exists():
                        shutil.copy(str(src), str(dest / artifact))
                # newest metrics.csv
                csvs = sorted(run_dir.glob("csv_logs/version_*/metrics.csv"))
                if csvs:
                    shutil.copy(str(csvs[-1]), str(dest / "metrics.csv"))
                (dest / "hyperparams.txt").write_text(
                    f"learning_rate={lr}\nmodel.dropout={dropout}\n"
                    f"modality_dropout={m_drop}\n"
                )
                all_results.append(result)

    summary = out_dir / "sweep_summary.json"
    summary.write_text(json.dumps(all_results, indent=2, default=float))
    print(f"\nSweep complete; summary at {summary}")
    best = min(all_results, key=lambda r: r.get("best_val_loss", 1e9))
    print(f"Best: {best['tag']} val_loss={best['best_val_loss']:.4f}")
    return all_results


def main(argv=None):
    from multimodal_emotion_detection_tpu.config import load_config

    argv = list(sys.argv[1:] if argv is None else argv)
    config_path, out_root = None, "grid_sweep_results"
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--config":
            config_path = next(it)
        elif a == "--out":
            out_root = next(it)
        else:
            rest.append(a)
    cfg = load_config(config_path, rest)
    return run_sweep(cfg, out_root=out_root, overrides=rest)


if __name__ == "__main__":
    main()
