"""r2r: flagship step decomposition + epoch-scan dispatch probe.

Two questions:
1. Where does the 2.5 ms flagship step (b32, cached frontend) go?
   Components timed: fwd-only loss, fwd+bwd, audio-only / video-only
   variants, optimizer update alone.
2. How much is per-step host dispatch on the tunneled backend?  Probe:
   lax.scan over K train steps in ONE dispatch (data is HBM-resident, the
   gather is already by-index) vs K python-loop dispatches.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2r_tpu.json"
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

    from bench import _build, _time_steps

    flush("platform", jax.default_backend())
    B, N = 32, 256

    # ---- reference: full step --------------------------------------------
    state, step, feats, labels = _build("logmel_cached", B, N)
    cps_full, state = _time_steps(state, step, feats, labels, B, N, 3, 30)
    flush("full_step_cps", round(cps_full, 1))
    ms_full = B / cps_full * 1e3

    # ---- epoch-scan: K steps in one dispatch -----------------------------
    from multimodal_emotion_detection_tpu.training.steps import (
        make_train_step,
    )

    # Rebuild an undonated step body we can close over in scan
    state2, step2, feats2, labels2 = _build("logmel_cached", B, N)

    import multimodal_emotion_detection_tpu.training.steps as steps_mod

    # reuse the exact step_fn via make_train_step(donate=False) and scan it
    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer

    cfg = Config()
    apply_overrides(cfg, [
        f"dataset.batch_size={B}",
        "model.encoders.audio.hidden_dim=256",
        "model.encoders.video.input_dim=4096",
    ])
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.cache = True
    model = classifier_from_config(cfg)
    tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)

    raw_step = steps_mod.make_train_step(
        model, tx, num_modalities=2, modality_dropout=0.1,
        has_batch_stats=bool(state2.model_state), donate=False,
    )

    K = 8  # steps per dispatch

    def epoch_body(carry, idx):
        st = carry
        new_st, metrics = raw_step(
            st, feats2, labels2, idx, jnp.ones((B,), jnp.float32),
            jax.random.PRNGKey(0))
        return new_st, metrics["loss"]

    @jax.jit
    def scan_epoch(st, idx_mat):
        return jax.lax.scan(epoch_body, st, idx_mat)

    idx_mat = jnp.asarray(
        (np.arange(K * B).reshape(K, B)) % N, dtype=jnp.int32)

    st = state2
    for _ in range(3):
        st, losses = scan_epoch(st, idx_mat)
    float(losses[-1])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        st, losses = scan_epoch(st, idx_mat)
    float(losses[-1])
    dt = time.perf_counter() - t0
    cps_scan = B * K * iters / dt
    flush("epoch_scan", {
        "steps_per_dispatch": K,
        "cps": round(cps_scan, 1),
        "speedup_vs_loop": round(cps_scan / cps_full, 4),
        "ms_per_step": round(B / cps_scan * 1e3, 4),
    })

    # ---- component decomposition -----------------------------------------
    # fwd-only (loss value, no grad) on the same model/params
    def timed(fn, *args, iters=30, warmup=3):
        for _ in range(warmup):
            out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(np.asarray(x).ravel()[0]),
            jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(np.asarray(x).ravel()[0]),
            jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    batch = {m: a[:B] for m, a in feats2.items()}
    blabels = labels2[:B]
    mask = jnp.ones((B, 2), jnp.float32)
    import optax

    def loss_of(params, key):
        variables = {"params": params, **state2.model_state}
        logits = model.apply(variables, batch, mask, deterministic=False,
                             rngs={"dropout": key})
        if isinstance(logits, tuple):
            logits = logits[0]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, blabels).mean()

    key = jax.random.PRNGKey(1)
    fwd = jax.jit(loss_of)
    ms_fwd = timed(fwd, state2.params, key)
    grad = jax.jit(jax.grad(loss_of))
    ms_fwdbwd = timed(lambda p, k: jax.tree_util.tree_leaves(grad(p, k))[0],
                      state2.params, key)

    # optimizer alone
    g0 = grad(state2.params, key)

    @jax.jit
    def opt_only(g, opt_state, params):
        updates, new_opt = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    ms_opt = timed(lambda: opt_only(g0, state2.opt_state, state2.params),
                   iters=30)

    # audio-only and video-only fwd+bwd
    def loss_audio(params, key):
        variables = {"params": params, **state2.model_state}
        logits = model.apply(
            variables, batch,
            jnp.concatenate([jnp.ones((B, 1)), jnp.zeros((B, 1))], axis=1),
            deterministic=False, rngs={"dropout": key})
        if isinstance(logits, tuple):
            logits = logits[0]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, blabels).mean()

    # NOTE masking doesn't remove compute; instead build single-modality
    # models for an honest decomposition
    def build_single(modality):
        c2 = Config()
        apply_overrides(c2, [
            f"dataset.batch_size={B}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.video.input_dim=4096",
            f"dataset.modalities=['{modality}']",
        ])
        c2.model.frontend.audio = "logmel"
        c2.model.frontend.cache = True
        m2 = classifier_from_config(c2)
        sample = {modality: batch[modality]}
        params = m2.init(jax.random.PRNGKey(0), sample,
                         jnp.ones((B, 1), jnp.float32), deterministic=True)

        def loss2(p, k):
            logits = m2.apply(p, sample, jnp.ones((B, 1), jnp.float32),
                              deterministic=False, rngs={"dropout": k})
            if isinstance(logits, tuple):
                logits = logits[0]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, blabels).mean()

        g2fn = jax.jit(jax.grad(loss2))
        return timed(lambda p, k: jax.tree_util.tree_leaves(g2fn(p, k))[0],
                     params, key)

    ms_audio = build_single("audio")
    ms_video = build_single("video")

    flush("decomposition_ms", {
        "full_step": round(ms_full, 4),
        "fwd_only": round(ms_fwd, 4),
        "fwd_bwd": round(ms_fwdbwd, 4),
        "optimizer_only": round(ms_opt, 4),
        "audio_only_fwd_bwd": round(ms_audio, 4),
        "video_only_fwd_bwd": round(ms_video, 4),
        "dispatch_overhead_est": round(ms_full - B / cps_scan * 1e3, 4),
    })


if __name__ == "__main__":
    main()
