"""r3m: v2-kernel chunk retune under bf16 residual streams.

The double-buffer chunk lengths (FWD_CHUNK=4, BWD2_CHUNK=4) were tuned
in round 2 against f32 residual streams.  bf16 residuals (r3g/r3l)
halve the DMA bytes per chunk, shifting the compute:DMA overlap balance
— a larger chunk costs more VMEM but amortizes DMA issue overhead over
more steps.  This probe sweeps (fwd_chunk, bwd_chunk) in {4,8}^2 on the
production fast configs:

  A. flagship LSTM step (logmel_cached b32 f32 + rbg + bf16 residuals)
  B. GRU-encoder step (same knobs)

Each leg monkeypatches ops.lstm_kernel.{FWD_CHUNK,BWD2_CHUNK} and builds
a FRESH model/step (trace-time constants).  chunk=12 exceeds the 12 MiB
VMEM budget for the fwd kernel at h256/tile32, so {4,8} is the sweep.
Writes r3m_tpu.json incrementally; interleaved max-of-2 rounds.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r3m_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:220]}", flush=True)


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
    import jax.numpy as jnp

    import multimodal_emotion_detection_tpu.ops.lstm_kernel as lk
    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv
    from multimodal_emotion_detection_tpu.config import (
        Config,
        apply_overrides,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import (
        log_mel_spectrogram,
    )
    from multimodal_emotion_detection_tpu.training.optim import (
        build_optimizer,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_epoch_train_step,
    )
    from bench import _time_epoch_scan

    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")
    lv.set_res2_dtype("bfloat16")

    Bb, N = 32, 256
    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    def step_cps(encoder, fwd_chunk, bwd_chunk):
        prev_f, prev_b = lk.FWD_CHUNK, lk.BWD2_CHUNK
        lk.FWD_CHUNK, lk.BWD2_CHUNK = fwd_chunk, bwd_chunk
        try:
            cfg = Config()
            overrides = [
                f"dataset.batch_size={Bb}",
                "model.encoders.audio.hidden_dim=256",
                "model.encoders.video.input_dim=4096",
            ]
            if encoder == "gru":
                overrides.append("model.encoders.audio.encoder_type=gru")
            apply_overrides(cfg, overrides)
            cfg.model.frontend.audio = "logmel"
            cfg.model.frontend.cache = True
            model = classifier_from_config(cfg)
            lp = logmel_params_from_config(cfg.model.frontend)
            feats = {"audio": jax.jit(
                lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
            )(audio_raw), "video": video}
            tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
            sample = {m: a[:Bb] for m, a in feats.items()}
            state = create_train_state(
                model, tx, sample, jnp.ones((Bb, 2), jnp.float32),
                jax.random.PRNGKey(0))
            step = make_epoch_train_step(
                model, tx, num_modalities=2, modality_dropout=0.1,
                has_batch_stats=bool(state.model_state))
            cps, _ = _time_epoch_scan(state, step, feats, labels, Bb, N,
                                      warmup=2, iters=10)
            return round(cps, 1)
        finally:
            lk.FWD_CHUNK, lk.BWD2_CHUNK = prev_f, prev_b

    combos = [(4, 4), (8, 4), (4, 8), (8, 8)]
    for encoder in ("lstm", "gru"):
        legs = {}
        for rnd in range(2):
            for fc, bc in combos:
                name = f"f{fc}b{bc}"
                legs[name] = max(legs.get(name, 0.0),
                                 step_cps(encoder, fc, bc))
            flush(f"{encoder}_round{rnd}", dict(legs))
        base = legs["f4b4"]
        flush(f"{encoder}_chunk_sweep", {
            **legs,
            "best": max(legs, key=legs.get),
            "best_vs_f4b4": round(max(legs.values()) / base, 4),
        })


if __name__ == "__main__":
    main()
