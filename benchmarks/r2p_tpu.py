"""r2p: fused 2-layer GRU backward kernel — on-chip parity + A/B.

Mirrors r2n for the GRU family: full-VJP gradient parity (fused kernel vs
XLA scan backward) at the flagship geometry, then a GRU-encoder train-step
A/B (fused vs per-layer chains).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2p_tpu.json"
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

    from multimodal_emotion_detection_tpu.ops import lstm_kernel as lk
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_gru,
        set_bwd_kernel_mode,
    )

    flush("platform", jax.default_backend())

    # --- 1. on-chip gradient parity: fused GRU bwd vs XLA scan ------------
    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, t, d))
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.2).astype(jnp.float32)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[2 + 2 * i], (d if i == 0 else h,
                                                         3 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (h, 3 * h)),
         "b_ih": jnp.full((3 * h,), 0.02),
         "b_hh": jnp.full((3 * h,), 0.01)}
        for i in range(2)
    )

    def loss(x, keep, params):
        ys, hf = fused_gru(x, keep, params)
        return jnp.sum(ys * jnp.sin(ys)) + jnp.sum(hf ** 2)

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 2)))
    prev = set_bwd_kernel_mode("off")
    try:
        g_scan = jax.tree_util.tree_map(np.asarray, grad_fn(x, keep, params))
    finally:
        set_bwd_kernel_mode(prev)
    g_kern = jax.tree_util.tree_map(np.asarray, grad_fn(x, keep, params))
    rels = []
    for a, b_ in zip(jax.tree_util.tree_leaves(g_scan),
                     jax.tree_util.tree_leaves(g_kern)):
        denom = np.maximum(np.abs(a).max(), 1e-6)
        rels.append(float(np.abs(a - b_).max() / denom))
    flush("gru_fused_bwd_parity", {"max_rel": max(rels),
                                   "pass": max(rels) < 1e-4})

    # --- 2. GRU-encoder full train step A/B --------------------------------
    from bench import _time_steps
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
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_train_step,
    )

    def build_gru(batch, n_rows):
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
        rng = np.random.RandomState(0)
        wav = jnp.asarray(rng.randn(n_rows, 48000, 1), jnp.float32)
        lp = logmel_params_from_config(cfg.model.frontend)
        features = {
            "audio": jax.jit(
                lambda w: log_mel_spectrogram(w, lp, use_pallas=True))(wav),
            "video": jnp.asarray(rng.rand(n_rows, 24, 4096).astype(np.float32)),
        }
        labels = jnp.asarray(rng.randint(0, 8, n_rows), jnp.int32)
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
        sample = {m: a[:batch] for m, a in features.items()}
        state = create_train_state(
            model, tx, sample, jnp.ones((batch, 2), jnp.float32),
            jax.random.PRNGKey(0),
        )
        step = make_train_step(
            model, tx, num_modalities=2, modality_dropout=0.1,
            has_batch_stats=bool(state.model_state),
        )
        return state, step, features, labels

    def step_cps():
        state, step, feats, labels = build_gru(32, 256)
        cps, _ = _time_steps(state, step, feats, labels, 32, 256, 3, 30)
        return round(cps, 1)

    real = lk.gru2_bwd_kernel_supported
    try:
        lk.gru2_bwd_kernel_supported = lambda *a, **k: False
        cps_layered = step_cps()
    finally:
        lk.gru2_bwd_kernel_supported = real
    cps_fused = step_cps()
    flush("gru_flagship_ab", {"layered": cps_layered, "fused": cps_fused,
                              "speedup": round(cps_fused / cps_layered, 4)})


if __name__ == "__main__":
    main()
