"""End-to-end demo on synthetic RAVDESS-format media.

Generates .wav/.mp4 clips with class-separable content, runs the full
pipeline — ETL -> training (fused Pallas log-mel frontend) -> prediction
with MC-dropout -> missing-modality robustness -> AOT export — in a
scratch directory.  On the real TPU this reaches test accuracy 1.0 in
~15 epochs (~3 min including compiles); pass ``--cpu`` to force the CPU
backend (slower, identical code path).

    python examples/synthetic_ravdess_demo.py [--cpu] [--epochs 15]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def generate_media(root: Path, clips_per_class: int = 8) -> None:
    import cv2

    (root / "audio").mkdir(parents=True, exist_ok=True)
    (root / "video").mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for emotion in range(1, 9):
        for idx in range(clips_per_class):
            rep = idx % 2 + 1
            actor = idx // 2 + 1
            stem = f"03-01-{emotion:02d}-01-01-{rep:02d}-{actor:02d}"
            sr = 48000
            t = np.arange(int(sr * 2.8)) / sr
            f0 = 150 + emotion * 40 + actor * 5
            y = (0.4 * np.sin(2 * np.pi * f0 * t)
                 + 0.3 * np.sin(2 * np.pi * 2.3 * f0 * t)
                 + 0.05 * rng.randn(len(t)))
            pcm = (np.clip(y, -1, 1) * 32767).astype("<i2")
            with wave.open(str(root / "audio" / f"{stem}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(pcm.tobytes())
            vstem = f"01-01-{emotion:02d}-01-01-{rep:02d}-{actor:02d}"
            vw = cv2.VideoWriter(str(root / "video" / f"{vstem}.mp4"),
                                 cv2.VideoWriter_fourcc(*"mp4v"), 30,
                                 (128, 96))
            base = (emotion * 30) % 255
            for _ in range(36):
                frame = np.full((96, 128, 3), base, np.uint8)
                frame += (rng.rand(96, 128, 3) * 40).astype(np.uint8)
                vw.write(frame)
            vw.release()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--extra", nargs="*", default=[],
                        help="additional key.path=value config overrides")
    args = parser.parse_args()

    work = Path(args.workdir or tempfile.mkdtemp(prefix="ravdess_demo_"))
    work.mkdir(parents=True, exist_ok=True)
    print(f"== working in {work}")

    import os

    os.chdir(work)

    # 1) media + ETL
    print("== generating synthetic media")
    generate_media(work / "media")
    from multimodal_emotion_detection_tpu.data.ravdess import (
        build_ravdess_multimodal_raw,
        save_splits_to_disk,
    )

    train, val, test = build_ravdess_multimodal_raw(
        str(work / "media" / "audio"), str(work / "media" / "video"),
        val_size=0.15, test_size=0.15,
    )
    save_splits_to_disk(train, val, test, work / "dataset")

    # 2) training
    print("== training (Pallas log-mel frontend)")
    from multimodal_emotion_detection_tpu.config import load_config
    from multimodal_emotion_detection_tpu.train import run as train_run

    overrides = [
        "dataset.data_dir=dataset",
        "dataset.batch_size=16",
        "model.frontend.audio=logmel",
        f"training.max_epochs={args.epochs}",
        "training.learning_rate=5e-4",
        "experiment.name=demo",
    ]
    if args.cpu:
        overrides.append("runtime.platform=cpu")
    overrides.extend(args.extra)
    results = train_run(load_config(None, overrides))
    print("train results:", json.dumps(
        {k: round(float(v), 4) for k, v in results.items()
         if isinstance(v, (int, float))}))

    # 3) prediction + MC dropout + missing-modality robustness
    print("== inference / robustness")
    from multimodal_emotion_detection_tpu.tools.predict import main as predict

    predict(["--checkpoint", "outputs/demo/best.ckpt",
             "--out", "preds", "--mc-dropout", "5"] + overrides)
    predict(["--checkpoint", "outputs/demo/best.ckpt",
             "--out", "preds_audio_only", "--missing", "0"] + overrides)

    # 4) AOT export
    print("== AOT export")
    from multimodal_emotion_detection_tpu.tools.export import main as export

    export(["--checkpoint", "outputs/demo/best.ckpt",
            "--out", "model.stablehlo", "--batch", "16"] + overrides)
    print(f"== demo complete; artifacts in {work}")


if __name__ == "__main__":
    main()
