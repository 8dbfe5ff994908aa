"""Produce the committed sweep corpus: synthetic RAVDESS media -> ETL ->
the real 3x2x2 grid sweep -> harvested `sweep_results_synthetic/` tree.

End-to-end proof of the reference's sweep contract
(/root/reference/sweep.sh:27-29,130-173): same grid (3 lrs x 2 dropouts x
2 modality-dropouts), same tag scheme, same per-tag artifact layout
(results.json, confusion_matrix.{npy,png}, best.ckpt, metrics.csv,
hyperparams.txt).  The media are learnable (per-emotion audio tone +
video brightness pattern) so the corpus shows real convergence, and they
flow through the actual ETL CLI (data/ravdess.py), not a shortcut.

    python scripts/make_sweep_corpus.py [--out sweep_results_synthetic]
                                        [--platform cpu|'' (default TPU)]
"""

from __future__ import annotations

import math
import struct
import sys
import wave
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

EMOTION_FREQS = [220, 294, 330, 392, 440, 494, 523, 587]  # Hz per emotion


def gen_media(media_dir: Path, clips_per_emotion: int = 24) -> None:
    import numpy as np

    audio_dir = media_dir / "audio"
    video_dir = media_dir / "video"
    audio_dir.mkdir(parents=True, exist_ok=True)
    video_dir.mkdir(parents=True, exist_ok=True)
    import cv2

    rng = np.random.RandomState(0)
    sr = 16000
    for emotion in range(8):  # codes 01..08
        for k in range(clips_per_emotion):
            actor = (k % 24) + 1
            statement = (k // 24) % 2 + 1
            rep = 1
            intensity = 1
            stem = (f"{{mod}}-01-{emotion + 1:02d}-{intensity:02d}-"
                    f"{statement:02d}-{rep:02d}-{actor:02d}")
            # audio: emotion tone + harmonics + noise, 2.5-3.2s
            dur = 2.5 + rng.rand() * 0.7
            t = np.arange(int(sr * dur)) / sr
            f0 = EMOTION_FREQS[emotion] * (1 + 0.02 * rng.randn())
            y = (np.sin(2 * np.pi * f0 * t)
                 + 0.4 * np.sin(2 * np.pi * 2 * f0 * t)
                 + 0.25 * rng.randn(len(t)))
            y = (y / np.abs(y).max() * 0.8 * 32767).astype(np.int16)
            with wave.open(str(audio_dir / (stem.format(mod="03") + ".wav")),
                           "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(struct.pack(f"<{len(y)}h", *y))
            # video: emotion-specific moving gradient, 30 frames 64x64
            path = video_dir / (stem.format(mod="01") + ".mp4")
            vw = cv2.VideoWriter(str(path),
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 12.0, (64, 64))
            xx, yy = np.meshgrid(np.arange(64), np.arange(64))
            for f in range(30):
                phase = 2 * math.pi * f / 30
                img = (128 + 100 * np.sin(
                    xx / 64 * (emotion + 1) * math.pi + phase)
                    * np.cos(yy / 64 * (emotion + 1) * math.pi)
                    + 10 * rng.randn(64, 64))
                frame = np.clip(img, 0, 255).astype(np.uint8)
                vw.write(cv2.cvtColor(frame, cv2.COLOR_GRAY2BGR))
            vw.release()


def main() -> None:
    out_root = "sweep_results_synthetic"
    platform = None
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--out":
            out_root = next(args)
        elif a == "--platform":
            platform = next(args) or None

    work = ROOT / "_sweep_corpus_work"
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

    from multimodal_emotion_detection_tpu.config import load_config
    from multimodal_emotion_detection_tpu.tools.sweep import run_sweep

    # fresh runs + fresh harvest: stale checkpoint dirs from a previous
    # invocation would otherwise seed the managers' top-k recovery
    import shutil

    shutil.rmtree(work / "runs", ignore_errors=True)
    shutil.rmtree(out_root, ignore_errors=True)

    overrides = [
        "dataset.name=ravdess",
        f"dataset.data_dir={dataset}",
        "dataset.batch_size=16",
        "model.encoders.video.input_dim=4096",
        "model.encoders.audio.hidden_dim=256",
        "model.frontend.audio=logmel",
        "model.frontend.cache=true",
        "training.max_epochs=8",
        "training.early_stopping_patience=3",
        f"experiment.save_dir={work / 'runs'}",
        "experiment.name=sweep_corpus",
    ]
    if platform:
        overrides.append(f"runtime.platform={platform}")
    cfg = load_config(None, overrides)
    run_sweep(cfg, out_root=out_root, overrides=overrides)
    print("corpus complete:", out_root, flush=True)


if __name__ == "__main__":
    main()
