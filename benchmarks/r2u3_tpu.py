"""r2u3: pin down the fwd-train-kernel mismatch (r2u2) — value or residuals?

At b32 (single tile, production default) the fwd kernel leg shows grad
rel 0.042 vs XLA.  Separate:
  hf_value      - forward OUTPUT parity, kernel vs XLA (no grad)
  seq_value     - full sequence output parity (need_sequence path)
  grad_w_keepmask - grads with a real dropout keep mask (r2q geometry)
  unroll_off    - fwd kernel with full_unroll disabled (e37960c suspect)
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2u3_tpu.json"
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

    import multimodal_emotion_detection_tpu.ops.lstm_kernel as lk
    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    flush("platform", jax.default_backend())

    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, t, d))
    ones = jnp.ones((b, t, 1, h), jnp.float32)
    keepm = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.2).astype(
        jnp.float32)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[2 + 2 * i], (d if i == 0 else h,
                                                         4 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
         "b": jnp.full((4 * h,), 0.02)}
        for i in range(2)
    )

    def rel(a, b_):
        a, b_ = np.asarray(a), np.asarray(b_)
        return float(np.abs(a - b_).max() / max(np.abs(a).max(), 1e-6))

    def fwd_value(mode, keep):
        lv.set_fwd_kernel_mode(mode)
        lv.set_bwd_kernel_mode("off")
        return np.asarray(jax.jit(
            lambda x, keep, p: lv.fused_lstm_final(x, keep, p)
        )(x, keep, params))

    hf_k = fwd_value("auto", ones)
    hf_x = fwd_value("off", ones)
    flush("hf_value_rel", rel(hf_k, hf_x))

    def seq_value(mode, keep):
        lv.set_fwd_kernel_mode(mode)
        lv.set_bwd_kernel_mode("off")
        return np.asarray(jax.jit(
            lambda x, keep, p: lv.fused_lstm(x, keep, p)[0]
        )(x, keep, params))

    try:
        ys_k = seq_value("auto", ones)
        ys_x = seq_value("off", ones)
        flush("seq_value_rel", rel(ys_k, ys_x))
    except Exception as e:  # noqa: BLE001
        flush("seq_value_rel", f"error: {e}")

    def grads(fwd_mode, keep):
        lv.set_fwd_kernel_mode(fwd_mode)
        lv.set_bwd_kernel_mode("off")

        def loss(x, keep, p):
            hf = lv.fused_lstm_final(x, keep, p)
            return jnp.sum(hf * jnp.sin(hf))

        return jax.tree_util.tree_map(
            np.asarray,
            jax.jit(jax.grad(loss, argnums=(0, 2)))(x, keep, params))

    def tree_rel(g1, g2):
        rels = {}
        leaves1 = jax.tree_util.tree_leaves_with_path(g1)
        leaves2 = jax.tree_util.tree_leaves(g2)
        for (path, a), b_ in zip(leaves1, leaves2):
            key = jax.tree_util.keystr(path)
            rels[key] = round(
                float(np.abs(a - b_).max() / max(np.abs(a).max(), 1e-6)), 8)
        return rels

    flush("grad_rel_ones", tree_rel(grads("auto", ones), grads("off", ones)))
    flush("grad_rel_keepmask",
          tree_rel(grads("auto", keepm), grads("off", keepm)))


if __name__ == "__main__":
    main()
