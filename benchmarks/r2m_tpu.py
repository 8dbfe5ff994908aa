"""r2m: where does the 2.8 ms flagship step go, and is bf16 a b32 win?

Measures on the real chip:
  - flagship cached-frontend b32 fp32 (current headline point)
  - same in bf16 compute (params fp32; audit test test_bfloat16_compute_path)
  - audio-only and video-only cached-frontend steps (step breakdown)

Reuses bench.py's builders so numbers are directly comparable to the
headline JSON.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _build, _time_steps  # noqa: E402


def _audio_or_video_only(modality: str, batch: int, n_rows: int,
                         compute_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import log_mel_spectrogram
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_train_step,
    )

    cfg = Config()
    apply_overrides(cfg, [
        f"dataset.batch_size={batch}",
        "model.encoders.audio.hidden_dim=256",
        "model.encoders.video.input_dim=4096",
        f"runtime.compute_dtype={compute_dtype}",
        f"dataset.modalities=['{modality}']",
    ])
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.cache = True
    model = classifier_from_config(cfg)

    rng = np.random.RandomState(0)
    if modality == "audio":
        wav = jnp.asarray(rng.randn(n_rows, 48000, 1), jnp.float32)
        lp = logmel_params_from_config(cfg.model.frontend)
        features = {"audio": jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True))(wav)}
    else:
        features = {"video": jnp.asarray(
            rng.rand(n_rows, 24, 4096).astype(np.float32))}
    labels = jnp.asarray(rng.randint(0, 8, n_rows), jnp.int32)

    tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
    sample = {m: a[:batch] for m, a in features.items()}
    state = create_train_state(
        model, tx, sample, jnp.ones((batch, 1), jnp.float32),
        jax.random.PRNGKey(0),
    )
    step = make_train_step(
        model, tx, num_modalities=1, modality_dropout=0.0,
        has_batch_stats=bool(state.model_state),
    )
    return state, step, features, labels


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()

    batch, n_rows = 32, 256
    out = {"platform": "tpu", "batch_size": batch}

    state, step, feats, labels = _build("logmel_cached", batch, n_rows)
    cps, _ = _time_steps(state, step, feats, labels, batch, n_rows, 3, 30)
    out["flagship_f32"] = round(cps, 1)

    state, step, feats, labels = _build(
        "logmel_cached", batch, n_rows, compute_dtype="bfloat16")
    cps, _ = _time_steps(state, step, feats, labels, batch, n_rows, 3, 30)
    out["flagship_bf16"] = round(cps, 1)

    for mod in ("audio", "video"):
        state, step, feats, labels = _audio_or_video_only(mod, batch, n_rows)
        cps, _ = _time_steps(state, step, feats, labels, batch, n_rows, 3, 30)
        out[f"{mod}_only_f32"] = round(cps, 1)
        out[f"{mod}_only_f32_ms"] = round(batch / cps * 1e3, 3)

    for mod in ("audio", "video"):
        state, step, feats, labels = _audio_or_video_only(
            mod, batch, n_rows, compute_dtype="bfloat16")
        cps, _ = _time_steps(state, step, feats, labels, batch, n_rows, 3, 30)
        out[f"{mod}_only_bf16"] = round(cps, 1)

    out["flagship_f32_ms"] = round(batch / out["flagship_f32"] * 1e3, 3)
    out["flagship_bf16_ms"] = round(batch / out["flagship_bf16"] * 1e3, 3)
    print(json.dumps(out, indent=2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r2m_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
