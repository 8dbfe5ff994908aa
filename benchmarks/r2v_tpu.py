"""r2v: GRU kernel batch gate under the scan driver (b64/b128 f32).

The LSTM gates were raised to 256 for f32 after r2u measured the tiled
kernels winning at every batch; the GRU twins kept the conservative 32.
Same A/B for the GRU flagship variant: kernels on (gate raised) vs off.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2v_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def watchdog(seconds=3000):
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
    import jax.numpy as jnp

    import multimodal_emotion_detection_tpu.ops.lstm_kernel as lk
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
    from bench import _time_epoch_scan

    flush("platform", jax.default_backend())
    N = 256
    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    def build(batch):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={batch}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=gru",
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
        sample = {m: a[:batch] for m, a in feats.items()}
        state = create_train_state(
            model, tx, sample, jnp.ones((batch, 2), jnp.float32),
            jax.random.PRNGKey(0))
        step = make_epoch_train_step(
            model, tx, num_modalities=2, modality_dropout=0.1,
            has_batch_stats=bool(state.model_state))
        return state, step, feats

    for batch in (64, 128):
        out = {}
        for cap, tag in ((256, "on"), (32, "off")):
            lk._AUTO_MAX_BATCH = cap
            state, step, feats = build(batch)
            cps, _ = _time_epoch_scan(state, step, feats, labels, batch, N,
                                      warmup=2, iters=10)
            out[f"kernels_{tag}"] = round(cps, 1)
        out["speedup"] = round(out["kernels_on"] / out["kernels_off"], 4)
        flush(f"gru_b{batch}", out)
    lk._AUTO_MAX_BATCH = 32


if __name__ == "__main__":
    main()
