"""r3n: transformer-family step trace — name the next lever.

The audio-transformer family row sits at 12.5k clips/s b32 bf16+rbg
(MFU 0.289 analytic).  This probe traces the production epoch-scan step
(transformer audio encoder + frame video encoder, cached log-mel,
dropout 0.3/0.1 active, flash in-kernel attention dropout) and emits the
top-op table like r3i, for both f32 and bf16 compute, so the dominant
sink (flash kernel / PRNG / FFN matmuls / video encoder / head) is
named with data rather than guessed.  Writes r3n_tpu.json.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r3n_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}", flush=True)


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

    watchdog()
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    Bb, N, S = 32, 256, 8
    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    def build(compute_dtype):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={Bb}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=transformer",
            "model.encoders.video.input_dim=4096",
            f"runtime.compute_dtype={compute_dtype}",
        ])
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
            has_batch_stats=bool(state.model_state), donate=False)
        return state, step, feats

    for dtype in ("bfloat16", "float32"):
        st, ep, feats = build(dtype)
        key = jax.random.PRNGKey(0)
        mats = [jnp.asarray(
            (np.arange(S * Bb).reshape(S, Bb) + e * S * Bb) % N,
            jnp.int32) for e in range(13)]
        vmat = jnp.ones((S, Bb), jnp.float32)
        m = None
        for e in range(3):
            st, m = ep(st, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        t0 = time.perf_counter()
        for e in range(3, 11):
            st, m = ep(st, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        flush(f"escan_cps_{dtype}",
              round(8 * S * Bb / (time.perf_counter() - t0), 1))

        tdir = f"/tmp/r3n_trace_{dtype}"
        jax.profiler.start_trace(tdir)
        for e in range(3, 13):
            st, m = ep(st, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        jax.profiler.stop_trace()
        paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
        with gzip.open(sorted(paths)[-1], "rt") as f:
            trace = json.load(f)
        by_name = defaultdict(float)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                by_name[ev.get("name", "?")] += ev["dur"]
        top = sorted(by_name.items(), key=lambda kv: -kv[1])[:30]
        flush(f"trace_top_ops_ms_per_step_{dtype}",
              [[n, round(us / 1e3 / 80, 4)] for n, us in top])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
