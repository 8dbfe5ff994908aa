"""r2x: session-3 config-lever probes (re-runnable; recorded results in
r2x_tpu.json).

Three probes that informed defaults/docs:
  xla_control   - the decisive numerics control from docs/KERNELS.md:
                  two PURE-XLA formulations of the same 2-layer LSTM scan
                  (split dots vs concatenated [x,h] @ [W_ih;W_hh]) diverge
                  with the same seed/envelope as kernel-vs-XLA, proving
                  the spread is precision chaos, not kernel corruption.
  rbg           - runtime.prng_impl=rbg on the transformer/LSTM flagship
                  steps (dropout-mask PRNG cost).
  transformer_bf16 - compute_dtype=bfloat16 on the transformer step.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2x_tpu.json"
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


def step_cps(etype, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from bench import _time_epoch_scan
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

    B, N = 32, 256
    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    cfg = Config()
    apply_overrides(cfg, [
        f"dataset.batch_size={B}",
        "model.encoders.audio.hidden_dim=256",
        f"model.encoders.audio.encoder_type={etype}",
        "model.encoders.video.input_dim=4096",
        f"runtime.compute_dtype={dtype}",
    ])
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.cache = True
    model = classifier_from_config(cfg)
    lp = logmel_params_from_config(cfg.model.frontend)
    feats = {
        "audio": jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
        )(audio_raw),
        "video": jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32)),
    }
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)
    tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
    sample = {m: a[:B] for m, a in feats.items()}
    state = create_train_state(model, tx, sample,
                               jnp.ones((B, 2), jnp.float32),
                               jax.random.PRNGKey(0))
    step = make_epoch_train_step(
        model, tx, num_modalities=2, modality_dropout=0.1,
        has_batch_stats=bool(state.model_state))
    cps, _ = _time_epoch_scan(state, step, feats, labels, B, N,
                              warmup=2, iters=10)
    return round(cps, 1)


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    flush("platform", jax.default_backend())

    # ---- xla_control ------------------------------------------------------
    b, d, h, t = 32, 64, 256, 375
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[2 + 2 * i], (d if i == 0 else h,
                                                         4 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
         "b": jnp.full((4 * h,), 0.02)}
        for i in range(2)
    )
    x_tm = jax.random.normal(ks[0], (t, b, d))
    keep = (jax.random.uniform(ks[1], (t, b, h)) > 0.2).astype(jnp.float32)

    def cell(hc, gates):
        h_, c_ = hc
        i = jax.nn.sigmoid(gates[..., :h])
        f = jax.nn.sigmoid(gates[..., h:2 * h])
        g = jnp.tanh(gates[..., 2 * h:3 * h])
        o = jax.nn.sigmoid(gates[..., 3 * h:])
        c_n = f * c_ + i * g
        return jnp.tanh(c_n) * o, c_n

    def make(variant):
        @jax.jit
        def run(x_tm, keep):
            ih0 = x_tm @ params[0]["w_ih"] + params[0]["b"]
            w_cat = jnp.concatenate(
                [params[1]["w_ih"], params[1]["w_hh"]], axis=0)

            def step(carry, inp):
                (h0, c0, h1, c1) = carry
                ih0_t, keep_t = inp
                g0 = ih0_t + h0 @ params[0]["w_hh"]
                h0n, c0n = cell((h0, c0), g0)
                x1 = h0n * keep_t
                if variant == "split":
                    g1 = (x1 @ params[1]["w_ih"] + params[1]["b"]
                          + h1 @ params[1]["w_hh"])
                else:
                    g1 = (jnp.concatenate([x1, h1], axis=-1) @ w_cat
                          + params[1]["b"])
                h1n, c1n = cell((h1, c1), g1)
                return (h0n, c0n, h1n, c1n), h1n

            z = jnp.zeros((b, h), jnp.float32)
            _, ys = jax.lax.scan(step, (z, z, z, z), (ih0, keep))
            return ys

        return run

    ys_a = np.asarray(make("split")(x_tm, keep))
    ys_b = np.asarray(make("cat")(x_tm, keep))
    d_t = np.abs(ys_a - ys_b).max(axis=(1, 2))
    flush("xla_control_split_vs_cat", {
        "absmax_first10_steps": float(d_t[:10].max()),
        "absmax_last": float(d_t[-1]),
        "rel_final": round(float(d_t[-1] / np.abs(ys_a).max()), 8),
    })

    # ---- rbg + dtype points ----------------------------------------------
    flush("threefry_transformer_f32", step_cps("transformer"))
    jax.config.update("jax_default_prng_impl", "rbg")
    flush("rbg_transformer_f32", step_cps("transformer"))
    flush("rbg_transformer_bf16", step_cps("transformer", "bfloat16"))
    flush("rbg_lstm_f32", step_cps("lstm"))
    jax.config.update("jax_default_prng_impl", "threefry2x32")


if __name__ == "__main__":
    main()
