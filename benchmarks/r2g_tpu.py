"""Round-2g TPU batch: encoder-variant step times with the round-2 levers.

1. variants — b32 train-step clips/s for lstm / gru / transformer(+flash)
   / cnn audio encoders, each with the cached log-mel frontend (the
   round-1 ablation table's successor; r1 numbers in ablation_tpu.json).
2. serving  — deterministic eval-path throughput (inference kernel
   default-on) at b32 and b256, cached features.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2g_tpu.json"
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


def _build_variant(encoder_type: str, batch: int, n_rows: int):
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import (
        log_mel_spectrogram,
    )
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_train_step,
    )

    cfg = Config()
    apply_overrides(cfg, [
        f"dataset.batch_size={batch}",
        f"model.encoders.audio.encoder_type={encoder_type}",
        "model.encoders.audio.hidden_dim=256",
        "model.encoders.audio.dropout=0.0",  # flash stays on in training
        "model.encoders.video.input_dim=4096",
    ])
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.cache = True
    model = classifier_from_config(cfg)

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(n_rows, 48000, 1), jnp.float32)
    lp = logmel_params_from_config(cfg.model.frontend)
    features = {
        "audio": jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True))(raw),
        "video": jnp.asarray(rng.rand(n_rows, 24, 4096).astype(np.float32)),
    }
    labels = jnp.asarray(rng.randint(0, 8, n_rows), jnp.int32)
    tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
    sample = {m: a[:batch] for m, a in features.items()}
    state = create_train_state(
        model, tx, sample, jnp.ones((batch, 2), jnp.float32),
        jax.random.PRNGKey(0),
    )
    step = make_train_step(model, tx, num_modalities=2, modality_dropout=0.1,
                           has_batch_stats=bool(state.model_state))
    return cfg, model, state, step, features, labels


def section_variants():
    import bench

    out = {}
    for enc in ("lstm", "gru", "transformer", "cnn"):
        try:
            _, _, state, step, features, labels = _build_variant(enc, 32, 256)
            cps, _ = bench._time_steps(state, step, features, labels,
                                       32, 256, warmup=3, iters=30)
            out[enc] = round(cps, 2)
        except Exception as exc:  # noqa: BLE001
            out[enc] = f"error: {repr(exc)[:200]}"
        flush("variants_b32_cached", out)


def section_serving():
    import jax
    import jax.numpy as jnp

    out = {}
    for batch in (32, 256):
        cfg, model, state, _, features, labels = _build_variant(
            "lstm", batch, 256)

        def forward(params, feats):
            return model.apply({"params": params}, feats,
                               deterministic=True)

        jfwd = jax.jit(forward)
        sample = {m: a[:batch] for m, a in features.items()}
        logits = jfwd(state.params, sample)
        float(jnp.sum(logits))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(30):
                logits = jfwd(state.params, sample)
            float(jnp.sum(logits))
            best = min(best, (time.perf_counter() - t0) / 30)
        out[f"eval_b{batch}_clips_per_sec"] = round(batch / best, 2)
        flush("serving_cached", out)


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    flush("platform", jax.default_backend())
    for name, fn in [("variants", section_variants),
                     ("serving", section_serving)]:
        try:
            fn()
        except Exception as exc:  # noqa: BLE001
            flush(f"{name}_error", repr(exc)[:500])


if __name__ == "__main__":
    main()
