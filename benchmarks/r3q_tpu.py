"""r3q: FULL-STEP flash-vs-XLA attention crossover in T.

r3o showed that at the flagship shape (T=375, b32, bf16) the full
transformer train step is 23% faster on the XLA MHA path than on the
Pallas flash kernel, while r3p's ISOLATED attention fwd+bwd already
favors flash at 375 (1.17x).  The gap is full-step-only costs on the
flash path (explicit (0,2,1,3) transposes in/out of the kernel, lost
fusion with neighbors).  This probe measures the production epoch-scan
train step (cached-frontend transformer encoder, dropout active, rbg,
bf16) across T and pins the FULL-STEP crossover that
``use_flash='auto'`` routes on.

T is varied by synthesizing cached audio features (N, T, n_mels)
directly — the cached-frontend config consumes them without a frontend
recompute, exactly like the production cache path.

Writes r3q_tpu.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r3q_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:240]}", flush=True)


def watchdog(seconds=3000):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.config import (
        Config,
        apply_overrides,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.optim import (
        build_optimizer,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_epoch_train_step,
    )

    watchdog()
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    Bb, N, S = 32, 256, 8
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    def build(T, use_flash):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={Bb}",
            "runtime.compute_dtype=bfloat16",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=transformer",
            f"model.encoders.audio.use_flash={'true' if use_flash else 'false'}",
            "model.encoders.video.input_dim=4096",
        ])
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.cache = True
        model = classifier_from_config(cfg)
        n_mels = cfg.model.frontend.n_mels
        feats = {
            "audio": jnp.asarray(
                rng.rand(N, T, n_mels).astype(np.float32)),
            "video": video,
        }
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
        sample = {m: a[:Bb] for m, a in feats.items()}
        state = create_train_state(
            model, tx, sample, jnp.ones((Bb, 2), jnp.float32),
            jax.random.PRNGKey(0))
        md = cfg.training.augmentation.modality_dropout
        step = make_epoch_train_step(
            model, tx, num_modalities=2, modality_dropout=md,
            has_batch_stats=bool(state.model_state), donate=False)
        return state, step, feats

    LENGTHS = [375, 512, 768, 1024, 1536]

    legs = {f"{T}_{k}": 0.0 for T in LENGTHS for k in ("flash", "xla")}
    built = {}
    for rnd in range(2):
        for T in LENGTHS:
            for kind in ("flash", "xla"):
                name = f"{T}_{kind}"
                if name not in built:
                    built[name] = build(T, kind == "flash")
                st, ep, feats = built[name]
                key = jax.random.PRNGKey(0)
                mats = [jnp.asarray(
                    (np.arange(S * Bb).reshape(S, Bb) + e * S * Bb) % N,
                    jnp.int32) for e in range(7)]
                vmat = jnp.ones((S, Bb), jnp.float32)
                for e in range(2):
                    st, m = ep(st, feats, labels, mats[e], vmat, key)
                float(m["loss"][-1])
                t0 = time.perf_counter()
                for e in range(2, 7):
                    st, m = ep(st, feats, labels, mats[e], vmat, key)
                float(m["loss"][-1])
                cps = round(5 * S * Bb / (time.perf_counter() - t0), 1)
                legs[name] = max(legs[name], cps)
                built[name] = (st, ep, feats)
        flush(f"round{rnd}", dict(legs))

    summary = {}
    for T in LENGTHS:
        f, x = legs[f"{T}_flash"], legs[f"{T}_xla"]
        summary[str(T)] = {
            "flash_cps": f, "xla_cps": x,
            "flash_speedup": round(f / x, 3),
        }
    flush("summary", summary)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
