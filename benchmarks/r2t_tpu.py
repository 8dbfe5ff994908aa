"""r2t: throughput table under the epoch-scan driver.

Batch/dtype sweep of the flagship (cached log-mel LSTM + frame) step and
the encoder-variant table (gru / transformer / cnn audio encoders), all
driven by make_epoch_train_step — refreshes README tables measured under
per-step dispatch (r2g) now that the driver amortizes dispatch.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2t_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def watchdog(seconds=3300):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    from bench import _build, _time_epoch_scan

    flush("platform", jax.default_backend())

    # ---- batch/dtype sweep, flagship (lstm) ------------------------------
    for batch, dtype in ((32, "float32"), (32, "bfloat16"),
                         (64, "float32"), (128, "float32"),
                         (256, "float32"), (256, "bfloat16")):
        state, step, feats, labels = _build(
            "logmel_cached", batch, 256, compute_dtype=dtype, scan=True)
        cps, _ = _time_epoch_scan(state, step, feats, labels, batch, 256,
                                  warmup=2, iters=12)
        flush(f"flagship_b{batch}_{dtype}", round(cps, 1))

    # ---- encoder variants at b32 f32 -------------------------------------
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import log_mel_spectrogram
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_epoch_train_step,
    )

    B, N = 32, 256
    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    for etype in ("gru", "transformer", "cnn"):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={B}",
            "model.encoders.audio.hidden_dim=256",
            f"model.encoders.audio.encoder_type={etype}",
            "model.encoders.video.input_dim=4096",
        ])
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.cache = True
        model = classifier_from_config(cfg)
        lp = logmel_params_from_config(cfg.model.frontend)
        feats = {
            "audio": jax.jit(
                lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
            )(audio_raw),
            "video": video,
        }
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
        sample = {m: a[:B] for m, a in feats.items()}
        state = create_train_state(
            model, tx, sample, jnp.ones((B, 2), jnp.float32),
            jax.random.PRNGKey(0))
        step = make_epoch_train_step(
            model, tx, num_modalities=2, modality_dropout=0.1,
            has_batch_stats=bool(state.model_state))
        cps, _ = _time_epoch_scan(state, step, feats, labels, B, N,
                                  warmup=2, iters=12)
        flush(f"encoder_{etype}_b32_f32", round(cps, 1))


if __name__ == "__main__":
    main()
