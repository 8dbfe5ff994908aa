"""r2w: in-kernel flash attention dropout — on-chip validation + A/B.

Validation strategy (PRNG is TPU-only, so everything runs on chip):
  1. determinism: same seed -> bitwise-identical output; different seed
     -> different mask pattern.
  2. rate=0.0 path identical to the pre-dropout kernel.
  3. mask extraction: with V = I (Tk == D), out rows ARE the dropped
     probs P~ = P o M/(1-rate); check entries are either 0 or
     P/(1-rate), and the drop fraction matches the rate.
  4. gradient proof: rebuild the exact mask M from (3), evaluate a pure
     -JAX reference softmax->mask->@V with that M, and compare ALL
     gradients (q, k, v) against the kernel's at the same seed.
  5. flagship transformer step with dropout 0.1: flash-with-dropout vs
     the old XLA-MHA fallback.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2w_tpu.json"
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
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.flash_attention import (
        flash_attention,
    )

    flush("platform", jax.default_backend())

    B, H, T, D = 2, 2, 128, 128  # Tk == D so V=I extracts the probs
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, T, D), jnp.float32)
    rate = 0.2
    seed = jnp.asarray([12345], jnp.int32)

    fa = jax.jit(lambda q, k, v, s: flash_attention(
        q, k, v, dropout_rate=rate, dropout_seed=s))
    fa0 = jax.jit(lambda q, k, v: flash_attention(q, k, v))

    # 1. determinism
    o1 = np.asarray(fa(q, k, v, seed))
    o2 = np.asarray(fa(q, k, v, seed))
    o3 = np.asarray(fa(q, k, v, jnp.asarray([999], jnp.int32)))
    flush("determinism", {
        "same_seed_bitwise": bool((o1 == o2).all()),
        "diff_seed_differs": bool((o1 != o3).any()),
    })

    # 2. rate=0 == plain kernel
    oz = np.asarray(jax.jit(lambda q, k, v: flash_attention(
        q, k, v, dropout_rate=0.0))(q, k, v))
    op = np.asarray(fa0(q, k, v))
    flush("rate0_identical", bool((oz == op).all()))

    # 3. mask extraction with V = I
    eye = jnp.broadcast_to(jnp.eye(T, dtype=jnp.float32), (B, H, T, T))
    p_drop = np.asarray(fa(q, k, eye, seed))  # (B, H, T, T) = P~
    s_ref = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k))
    s_ref = s_ref / np.sqrt(D)
    p_ref = np.exp(s_ref - s_ref.max(-1, keepdims=True))
    p_ref = p_ref / p_ref.sum(-1, keepdims=True)
    ratio = p_drop / np.maximum(p_ref, 1e-30)
    is_zero = np.abs(ratio) < 1e-3
    is_kept = np.abs(ratio - 1.0 / (1.0 - rate)) < 1e-3
    flush("mask_extraction", {
        "all_entries_zero_or_scaled": bool((is_zero | is_kept).all()),
        "drop_fraction": round(float(is_zero.mean()), 4),
        "expected_rate": rate,
    })

    # 4. gradient proof with the extracted mask
    mask = jnp.asarray((~is_zero).astype(np.float32))

    def ref_loss(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(1.0 * D)
        p = jax.nn.softmax(s, axis=-1)
        pt = p * mask / (1.0 - rate)
        o = jnp.einsum("bhqk,bhkd->bhqd", pt, v)
        return jnp.sum(o * jnp.cos(o * 0.3))

    def fa_loss(q, k, v):
        o = flash_attention(q, k, v, dropout_rate=rate, dropout_seed=seed)
        return jnp.sum(o * jnp.cos(o * 0.3))

    g_ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(q, k, v)
    g_fa = jax.jit(jax.grad(fa_loss, argnums=(0, 1, 2)))(q, k, v)
    rels = {}
    for name, a, b_ in zip(("dq", "dk", "dv"), g_fa, g_ref):
        a, b_ = np.asarray(a), np.asarray(b_)
        rels[name] = round(
            float(np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-9)), 8)
    flush("grad_vs_reference_same_mask", rels)

    # multi-block geometry: T > block -> several k/q blocks, same checks
    T2 = 1024
    q2 = jax.random.normal(ks[3], (1, 1, T2, 64), jnp.float32)
    k2 = jax.random.normal(ks[0], (1, 1, T2, 64), jnp.float32)
    v2 = jax.random.normal(ks[1], (1, 1, T2, 64), jnp.float32)

    def fa2_loss(q, k, v):
        o = flash_attention(q, k, v, dropout_rate=rate, dropout_seed=seed)
        return jnp.sum(o * jnp.cos(o * 0.3))

    o_a = np.asarray(jax.jit(
        lambda q, k, v: flash_attention(q, k, v, dropout_rate=rate,
                                        dropout_seed=seed))(q2, k2, v2))
    o_b = np.asarray(jax.jit(
        lambda q, k, v: flash_attention(q, k, v, dropout_rate=rate,
                                        dropout_seed=seed))(q2, k2, v2))
    g2 = jax.jit(jax.grad(fa2_loss, argnums=(0, 1, 2)))(q2, k2, v2)
    finite = all(bool(np.isfinite(np.asarray(g)).all()) for g in g2)
    flush("multiblock_T1024", {
        "deterministic": bool((o_a == o_b).all()),
        "grads_finite": finite,
        "mean_ratio_vs_nodrop": round(float(
            np.abs(o_a).mean()
            / np.abs(np.asarray(fa0(q2, k2, v2))).mean()), 4),
    })

    # 5. flagship transformer A/B (dropout 0.1 active)
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

    Bb, N = 32, 256
    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    def step_cps(use_flash):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={Bb}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=transformer",
            f"model.encoders.audio.use_flash={str(use_flash).lower()}",
            "model.encoders.video.input_dim=4096",
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
            has_batch_stats=bool(state.model_state))
        cps, _ = _time_epoch_scan(state, step, feats, labels, Bb, N,
                                  warmup=2, iters=10)
        return round(cps, 1)

    on = step_cps(True)
    off = step_cps(False)
    flush("transformer_dropout_ab", {
        "flash_inkernel_dropout": on,
        "xla_mha_fallback": off,
        "speedup": round(on / off, 4),
    })


if __name__ == "__main__":
    main()
