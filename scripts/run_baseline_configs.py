"""Run all five BASELINE.json configs end-to-end on the current backend.

BASELINE.json names five canonical configurations ("configs" list); each
ships as a YAML in configs/.  This script proves every one of them trains
end-to-end through the real product surface — synthetic RAVDESS media ->
the ETL CLI (data/ravdess.py) -> the train CLI with the shipped YAML —
and banks per-config outcomes (best val loss, test metrics, train
clips/s, artifact checklist) in benchmarks/baseline_configs_tpu.json.
The uncertainty config additionally runs tools/predict.py --mc-dropout
on its best checkpoint (BASELINE config 5's eval half).

    python scripts/run_baseline_configs.py [--platform cpu] [--epochs 10]

Media/ETL are reused from scripts/make_sweep_corpus.py (same learnable
per-emotion tones/gradients, same ETL invocation).
"""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

OUT_JSON = ROOT / "benchmarks" / "baseline_configs_tpu.json"

# (BASELINE.json configs[] index, yaml, extra overrides)
CONFIGS = [
    (1, "audio_only.yaml", []),
    (2, "video_only.yaml", []),
    (3, "base.yaml", []),
    (4, "av_hybrid.yaml", []),
    (5, "uncertainty.yaml", []),
]


def ensure_dataset(work: Path) -> Path:
    from make_sweep_corpus import gen_media

    media = work / "media"
    dataset = work / "dataset"
    if not (dataset / "train" / "audio.npy").exists():
        print("generating media ...", flush=True)
        gen_media(media)
        print("running ETL CLI ...", flush=True)
        from multimodal_emotion_detection_tpu.data.ravdess import main as etl

        etl([
            "--audio_root", str(media / "audio"),
            "--video_root", str(media / "video"),
            "--out_root", str(dataset),
            "--val_size", "0.125", "--test_size", "0.125",
        ])
    return dataset


def best_clips_per_sec(csv_path: Path) -> float | None:
    """Max per-epoch train/clips_per_sec of the run (the early epochs
    include compile time, so the max approximates steady state)."""
    if not csv_path.exists():
        return None
    rows = csv_path.read_text().strip().splitlines()
    header = rows[0].split(",")
    if "train/clips_per_sec" not in header:
        return None
    idx = header.index("train/clips_per_sec")
    best = None
    for line in rows[1:]:
        cell = line.split(",")[idx]
        if cell:
            try:
                best = max(best or 0.0, float(cell))
            except ValueError:
                pass
    return best


def best_epoch_ckpt(ckpt_dir: Path) -> Path | None:
    """Lowest-val-loss epoch checkpoint (NEVER last.ckpt: lexicographic
    glob sorting would always pick it, and uncertainty-fusion runs don't
    get a best.ckpt copy — train.py's uncertainty branch)."""
    import re

    best = None
    for p in ckpt_dir.glob("epoch=*-val_loss=*.ckpt"):
        m = re.search(r"val_loss=([0-9.eE+-]+)\.ckpt$", p.name)
        if m:
            v = float(m.group(1))
            if best is None or v < best[0]:
                best = (v, p)
    return best[1] if best else None


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Run the five BASELINE.json configs end-to-end")
    parser.add_argument("--platform", default=None,
                        help="runtime.platform override (e.g. cpu)")
    parser.add_argument("--epochs", type=int, default=10)
    args = parser.parse_args(argv)
    platform, epochs = args.platform or None, args.epochs

    work = ROOT / "_baseline_configs_work"
    dataset = ensure_dataset(work)
    runs = work / "runs"
    shutil.rmtree(runs, ignore_errors=True)
    # the uncertainty path writes ./analysis + ./experiments relative to
    # CWD (reference contract) — keep those inside the work dir
    import os

    work.mkdir(exist_ok=True)
    os.chdir(work)

    from multimodal_emotion_detection_tpu.train import main as train_main

    report: dict = {"dataset": "synthetic RAVDESS media via ETL CLI",
                    "epochs": epochs, "configs": {}}
    for idx, yaml_name, extra in CONFIGS:
        name = yaml_name.removesuffix(".yaml")
        overrides = [
            f"dataset.data_dir={dataset}",
            "model.frontend.cache=true",
            f"training.max_epochs={epochs}",
            "training.early_stopping_patience=4",
            f"experiment.save_dir={runs}",
            f"experiment.name={name}",
            *extra,
        ]
        if platform:
            overrides.append(f"runtime.platform={platform}")
        print(f"=== BASELINE config {idx}: {yaml_name} ===", flush=True)
        t0 = time.perf_counter()
        results = train_main(
            ["--config", str(ROOT / "configs" / yaml_name), *overrides])
        wall = round(time.perf_counter() - t0, 1)
        save_dir = runs / name
        entry = {
            "yaml": yaml_name,
            "wall_s_incl_compile": wall,
            "train_clips_per_sec_best": best_clips_per_sec(
                save_dir / "csv_logs" / "version_0" / "metrics.csv"),
            "artifacts": {
                p: (save_dir / p).exists()
                for p in ("results.json", "confusion_matrix.npy",
                          "confusion_matrix.png", "best.ckpt")
            },
            **{k: (round(float(v), 4) if isinstance(v, (int, float)) else v)
               for k, v in results.items()
               if isinstance(v, (int, float, str))},
        }
        # uncertainty config writes its report instead of results.json
        if name == "uncertainty":
            entry["artifacts"] = {
                "uncertainty.json": any(
                    Path(p).exists() for p in
                    ("experiments/uncertainty.json",
                     str(save_dir / "uncertainty.json"))),
            }
        report["configs"][name] = entry
        OUT_JSON.write_text(json.dumps(report, indent=2))
        print(json.dumps(entry), flush=True)

    # BASELINE config 5's eval half: MC-dropout predict on the best ckpt
    # (uncertainty runs don't get a best.ckpt copy; pick the lowest-val-
    # loss epoch checkpoint by parsed filename, never last.ckpt)
    unc_dir = runs / "uncertainty"
    ckpt = best_epoch_ckpt(unc_dir / "checkpoints")
    if ckpt:
        from multimodal_emotion_detection_tpu.tools.predict import (
            main as predict_main,
        )

        print("=== MC-dropout predict (config 5 eval) ===", flush=True)
        pred_out = work / "predictions"
        pargs = ["--checkpoint", str(ckpt), "--mc-dropout", "8",
                 "--out", str(pred_out),
                 "--config", str(ROOT / "configs" / "uncertainty.yaml"),
                 f"dataset.data_dir={dataset}"]
        if platform:
            pargs.append(f"runtime.platform={platform}")
        metrics = predict_main(pargs)
        report["mc_dropout_predict"] = {
            "samples": 8,
            "checkpoint": ckpt.name,
            "artifacts": {p: (pred_out / p).exists()
                          for p in ("metrics.json", "logits.npy",
                                    "predictions.npy", "uncertainty.npy")},
            **{k: v for k, v in metrics.items()
               if isinstance(v, (int, float, str))},
        }
        OUT_JSON.write_text(json.dumps(report, indent=2))

    print("DONE ->", OUT_JSON, flush=True)


if __name__ == "__main__":
    main()
