"""r2q: dys-free fused backward (final-hidden-only path) — parity + A/B.

The flagship encoder consumes only h_final, so the ys cotangent is
structurally zero; fused_lstm_final omits the 12 MB/step zero stream.
Measures the full flagship train step with the dys-free path vs the
previous fused path (zeros materialized + streamed).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2q_tpu.json"
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

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_lstm,
        fused_lstm_final,
    )

    flush("platform", jax.default_backend())

    # --- on-chip parity: dys-free backward vs full fused_lstm -------------
    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, t, d))
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.2).astype(jnp.float32)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[2 + 2 * i], (d if i == 0 else h,
                                                         4 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
         "b": jnp.full((4 * h,), 0.02)}
        for i in range(2)
    )

    def loss_full(x, keep, params):
        _, hf = fused_lstm(x, keep, params)
        return jnp.sum(hf * jnp.sin(hf))

    def loss_final(x, keep, params):
        hf = fused_lstm_final(x, keep, params)
        return jnp.sum(hf * jnp.sin(hf))

    g1 = jax.tree_util.tree_map(
        np.asarray,
        jax.jit(jax.grad(loss_full, argnums=(0, 2)))(x, keep, params))
    g2 = jax.tree_util.tree_map(
        np.asarray,
        jax.jit(jax.grad(loss_final, argnums=(0, 2)))(x, keep, params))
    rels = []
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g2)):
        denom = np.maximum(np.abs(a).max(), 1e-6)
        rels.append(float(np.abs(a - b_).max() / denom))
    flush("dysfree_parity", {"max_rel": max(rels),
                             "pass": max(rels) < 1e-4})

    # --- full flagship train step A/B --------------------------------------
    from bench import _build, _time_steps
    from multimodal_emotion_detection_tpu.models import encoders as enc_mod

    def step_cps():
        state, step, feats, labels = _build("logmel_cached", 32, 256)
        cps, _ = _time_steps(state, step, feats, labels, 32, 256, 3, 30)
        return round(cps, 1)

    # A: force the old behavior (sequence output requested -> dys zeros
    # materialized + streamed) by patching the encoder's need_sequence
    import multimodal_emotion_detection_tpu.models.recurrent as rec_mod

    real_call = rec_mod.FusedStackedRNN.__call__

    def forced_seq(self, x, deterministic=True, need_sequence=True):
        return real_call(self, x, deterministic=deterministic,
                         need_sequence=True)

    rec_mod.FusedStackedRNN.__call__ = forced_seq
    try:
        cps_with_dys = step_cps()
    finally:
        rec_mod.FusedStackedRNN.__call__ = real_call
    cps_dysfree = step_cps()
    flush("flagship_ab", {
        "with_zero_dys_stream": cps_with_dys,
        "dys_free": cps_dysfree,
        "speedup": round(cps_dysfree / cps_with_dys, 4),
    })


if __name__ == "__main__":
    main()
