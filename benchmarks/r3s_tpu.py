"""r3s: fused-QKV projection for the XLA attention route — full-step A/B.

With ``use_flash='auto'`` the transformer family rides the XLA MHA in
the small-scores regime (r3q/r3r).  There the three q/k/v projection
gemms are (B*T, D) x (D, H*Dh) each — small-N dispatches.  The
_FusedQKVSelfAttention module (models/encoders.py) replaces them with a
single (D, 3*H*Dh) einsum: same param tree, same flax attention core,
bitwise-equal init and outputs (CPU-verified).  This probe measures the
production epoch-scan train step both ways at the XLA-routed shapes
(T=375 and T=768, b32, bf16, dropout active, rbg) and decides the
_XLA_FUSED_QKV default.

Writes r3s_tpu.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r3s_tpu.json"
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
    from multimodal_emotion_detection_tpu.models import encoders as enc_mod
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

    def build(T, fused):
        enc_mod.set_xla_fused_qkv(fused)
        try:
            cfg = Config()
            apply_overrides(cfg, [
                f"dataset.batch_size={Bb}",
                "runtime.compute_dtype=bfloat16",
                "model.encoders.audio.hidden_dim=256",
                "model.encoders.audio.encoder_type=transformer",
                "model.encoders.video.input_dim=4096",
            ])
            cfg.model.frontend.audio = "logmel"
            cfg.model.frontend.cache = True
            model = classifier_from_config(cfg)
            feats = {
                "audio": jnp.asarray(
                    rng.rand(N, T, cfg.model.frontend.n_mels).astype(
                        np.float32)),
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
            # trace NOW so the module switch is captured in this build
            key = jax.random.PRNGKey(0)
            mat0 = jnp.asarray(
                np.arange(S * Bb).reshape(S, Bb) % N, jnp.int32)
            vmat = jnp.ones((S, Bb), jnp.float32)
            state, m = step(state, feats, labels, mat0, vmat, key)
            float(m["loss"][-1])
            return state, step, feats
        finally:
            enc_mod.set_xla_fused_qkv(False)

    LEGS = [("T375", 375), ("T768", 768)]

    legs = {f"{n}_{k}": 0.0 for n, _ in LEGS for k in ("fused", "stock")}
    built = {}
    for rnd in range(3):
        for name, T in LEGS:
            for kind in ("fused", "stock"):
                leg = f"{name}_{kind}"
                if leg not in built:
                    built[leg] = build(T, kind == "fused")
                st, ep, feats = built[leg]
                key = jax.random.PRNGKey(0)
                mats = [jnp.asarray(
                    (np.arange(S * Bb).reshape(S, Bb) + e * S * Bb) % N,
                    jnp.int32) for e in range(11)]
                vmat = jnp.ones((S, Bb), jnp.float32)
                for e in range(3):
                    st, m = ep(st, feats, labels, mats[e], vmat, key)
                float(m["loss"][-1])
                t0 = time.perf_counter()
                for e in range(3, 11):
                    st, m = ep(st, feats, labels, mats[e], vmat, key)
                float(m["loss"][-1])
                cps = round(8 * S * Bb / (time.perf_counter() - t0), 1)
                legs[leg] = max(legs[leg], cps)
                built[leg] = (st, ep, feats)
        flush(f"round{rnd}", dict(legs))

    summary = {}
    for name, _ in LEGS:
        f, s = legs[f"{name}_fused"], legs[f"{name}_stock"]
        summary[name] = {"fused_cps": f, "stock_cps": s,
                         "fused_speedup": round(f / s, 3)}
    flush("summary", summary)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
