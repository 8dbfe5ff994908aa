"""r2s: device-true step decomposition under the epoch-scan driver.

r2r showed ~1.07 ms/step host dispatch on the tunneled backend, which
polluted every isolated component timing.  Here every variant runs as a
lax.scan over K=8 steps per dispatch, so differences between variants are
device time, not dispatch.  Variants (all b32, cached log-mel frontend):

  full        - flagship step (audio LSTM + video frame + head + AdamW)
  no_opt      - forward+backward only (grads computed, update skipped)
  fwd_only    - loss forward only (no grad)
  audio_only  - single-modality model: audio LSTM encoder + head
  video_only  - single-modality model: video frame encoder + head
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2s_tpu.json"
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


B, N, K = 32, 256, 8


def scan_time_ms(scan_fn, carry, mats, iters=12, warmup=3):
    """Time jit(scan_fn)(carry, idx_mat) over epochs; ms per step."""
    import jax

    out = None
    for e in range(warmup):
        carry, out = scan_fn(carry, mats[e % len(mats)])
    float(np.asarray(out)[-1])
    t0 = time.perf_counter()
    for e in range(iters):
        carry, out = scan_fn(carry, mats[(warmup + e) % len(mats)])
    float(np.asarray(out)[-1])
    dt = time.perf_counter() - t0
    return dt / (iters * K) * 1e3


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_emotion_detection_tpu.config import (
        Config,
        apply_overrides,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import log_mel_spectrogram
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer

    flush("platform", jax.default_backend())

    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels_all = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    def build(modalities):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={B}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.video.input_dim=4096",
            f"dataset.modalities=[{','.join(modalities)}]",
        ])
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.cache = True
        model = classifier_from_config(cfg)
        lp = logmel_params_from_config(cfg.model.frontend)
        feats = {}
        if "audio" in modalities:
            feats["audio"] = jax.jit(
                lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
            )(audio_raw)
        if "video" in modalities:
            feats["video"] = video
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
        sample = {m: a[:B] for m, a in feats.items()}
        nm = len(modalities)
        params = model.init(jax.random.PRNGKey(0), sample,
                            jnp.ones((B, nm), jnp.float32),
                            deterministic=True)
        return model, tx, params, feats, nm

    mats = [
        jnp.asarray((np.arange(K * B).reshape(K, B) + e) % N, jnp.int32)
        for e in range(16)
    ]

    def variant(name, modalities, mode):
        model, tx, variables, feats, nm = build(modalities)
        params = variables["params"] if "params" in variables else variables
        opt_state = tx.init(params)

        def loss_fn(p, idx, key):
            batch = {m: jnp.take(a, idx, axis=0) for m, a in feats.items()}
            bl = jnp.take(labels_all, idx, axis=0)
            logits = model.apply(
                {"params": p}, batch, jnp.ones((B, nm), jnp.float32),
                deterministic=False, rngs={"dropout": key})
            if isinstance(logits, tuple):
                logits = logits[0]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, bl).mean()

        if mode == "fwd":
            def body(carry, idx):
                p, _ = carry
                l = loss_fn(p, idx, jax.random.PRNGKey(1))
                return (p, opt_state), l
        elif mode == "grad":
            def body(carry, idx):
                p, os_ = carry
                l, g = jax.value_and_grad(loss_fn)(
                    p, idx, jax.random.PRNGKey(1))
                # fold grads into the carry so XLA can't DCE the bwd pass
                p = jax.tree_util.tree_map(lambda a, b: a + 0.0 * b, p, g)
                return (p, os_), l
        else:  # full
            def body(carry, idx):
                p, os_ = carry
                l, g = jax.value_and_grad(loss_fn)(
                    p, idx, jax.random.PRNGKey(1))
                up, os2 = tx.update(g, os_, p)
                return (optax.apply_updates(p, up), os2), l

        scan_fn = jax.jit(
            lambda carry, mat: jax.lax.scan(body, carry, mat))
        ms = scan_time_ms(scan_fn, (params, opt_state), mats)
        flush(name, round(ms, 4))
        return ms

    variant("full_ms", ["audio", "video"], "full")
    variant("no_opt_ms", ["audio", "video"], "grad")
    variant("fwd_only_ms", ["audio", "video"], "fwd")
    variant("audio_only_ms", ["audio"], "full")
    variant("video_only_ms", ["video"], "full")


if __name__ == "__main__":
    main()
