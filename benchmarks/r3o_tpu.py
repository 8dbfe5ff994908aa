"""r3o: transformer-family ablation — attribute the step and name the lever.

r3n traced the production transformer epoch-scan step but the while-loop
hides per-op names; this probe attributes by ABLATION instead.  It also
fixes an r3n blind spot: ``build_encoder`` defaults ``use_flash=False``
(config-built transformers ride XLA MHA unless the config sets the knob),
so r3n's 12.0k bf16 row was the XLA-attention path, NOT the flash kernel
the family docs describe.  Variants (epoch-scan step, b32, rbg PRNG):

  base          bf16, use_flash=true, dropout 0.1 enc / 0.3 head
  xla_attn      bf16, use_flash=false (r3n's accidental configuration)
  nodrop        bf16, flash, all dropout rates 0
  layers1       bf16, flash, num_layers=1
  f32_flash     f32, flash (vs r3n's 8.1k f32 XLA row)

Writes r3o_tpu.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r3o_tpu.json"
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

    def build(overrides):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={Bb}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=transformer",
            "model.encoders.video.input_dim=4096",
            *overrides,
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
        md = cfg.training.augmentation.modality_dropout
        step = make_epoch_train_step(
            model, tx, num_modalities=2, modality_dropout=md,
            has_batch_stats=bool(state.model_state), donate=False)
        return state, step, feats

    VARIANTS = {
        "base": ["runtime.compute_dtype=bfloat16",
                 "model.encoders.audio.use_flash=true"],
        "xla_attn": ["runtime.compute_dtype=bfloat16",
                     "model.encoders.audio.use_flash=false"],
        "nodrop": ["runtime.compute_dtype=bfloat16",
                   "model.encoders.audio.use_flash=true",
                   "model.encoders.audio.dropout=0.0",
                   "model.dropout=0.0",
                   "model.encoders.video.dropout=0.0",
                   "training.augmentation.modality_dropout=0.0"],
        "layers1": ["runtime.compute_dtype=bfloat16",
                    "model.encoders.audio.use_flash=true",
                    "model.encoders.audio.num_layers=1"],
        # single-knob pair: ONLY the encoder dropout differs from
        # base/xla_attn — isolates the in-kernel dropout PRNG cost from
        # the attention-algorithm cost (nodrop above moves four knobs)
        "flash_encnodrop": ["runtime.compute_dtype=bfloat16",
                            "model.encoders.audio.use_flash=true",
                            "model.encoders.audio.dropout=0.0"],
        "xla_encnodrop": ["runtime.compute_dtype=bfloat16",
                          "model.encoders.audio.use_flash=false",
                          "model.encoders.audio.dropout=0.0"],
        "f32_flash": ["runtime.compute_dtype=float32",
                      "model.encoders.audio.use_flash=true"],
    }

    # two interleaved rounds so machine drift can't masquerade as a lever
    legs = {name: 0.0 for name in VARIANTS}
    built = {}
    for rnd in range(2):
        for name, ovr in VARIANTS.items():
            if name not in built:
                built[name] = build(ovr)
            st, ep, feats = built[name]
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
            legs[name] = max(legs[name], cps)
            built[name] = (st, ep, feats)
        flush(f"round{rnd}", dict(legs))

    flush("summary", {
        **legs,
        "flash_vs_xla": round(legs["base"] / legs["xla_attn"], 3),
        "flash_vs_xla_encnodrop": round(
            legs["flash_encnodrop"] / legs["xla_encnodrop"], 3),
        "dropout_cost": round(legs["nodrop"] / legs["base"], 3),
        "layer2_share": round(1 - legs["base"] / legs["layers1"], 3),
    })
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
