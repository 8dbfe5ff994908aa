"""r2u6: corruption or chaos?  Two decisive probes on chip.

H1 (bug): the fwd kernel computes layer 1 wrong on chip.
H2 (chaos): kernel and XLA are both valid f32 evaluations whose tiny
rounding difference (different matmul tilings for the layer-1 two-dot
step) is amplified exponentially by the recurrence; each path's
gradients remain consistent with its OWN forward.

Probe A: kernel-vs-XLA max-rel of the ys series as a function of T
(50/100/200/375).  Chaos predicts roughly exponential growth from
~1e-7; a layout bug predicts shape-independent O(1) error.

Probe B: directional derivative check of the PRODUCTION path (fwd
kernel + fused bwd kernel) against its own forward:
(loss(x+eps v) - loss(x-eps v)) / 2eps  vs  <grad, v>, f32 on chip.
Consistency here means production training gradients are correct for
the forward actually computed, regardless of H1/H2.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2u6_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def watchdog(seconds=2700):
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

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    flush("platform", jax.default_backend())

    b, d, h = 32, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[2 + 2 * i], (d if i == 0 else h,
                                                         4 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
         "b": jnp.full((4 * h,), 0.02)}
        for i in range(2)
    )

    # ---- Probe A: divergence vs T ----------------------------------------
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_train_fwd_pallas,
    )

    growth = {}
    for t in (50, 100, 200, 375):
        x_tm = jax.random.normal(ks[0], (t, b, d))
        keep = (jax.random.uniform(ks[1], (t, b, h)) > 0.2).astype(
            jnp.float32)

        def cell(hc, gates):
            h_, c_ = hc
            i = jax.nn.sigmoid(gates[..., :h])
            f = jax.nn.sigmoid(gates[..., h:2 * h])
            g = jnp.tanh(gates[..., 2 * h:3 * h])
            o = jax.nn.sigmoid(gates[..., 3 * h:])
            c_n = f * c_ + i * g
            return jnp.tanh(c_n) * o, c_n

        @jax.jit
        def ref(x_tm, keep):
            ih0 = x_tm @ params[0]["w_ih"] + params[0]["b"]

            def step(carry, inp):
                (h0, c0, h1, c1) = carry
                ih0_t, keep_t = inp
                g0 = ih0_t + h0 @ params[0]["w_hh"]
                h0n, c0n = cell((h0, c0), g0)
                x1 = h0n * keep_t
                g1 = (x1 @ params[1]["w_ih"] + params[1]["b"]
                      + h1 @ params[1]["w_hh"])
                h1n, c1n = cell((h1, c1), g1)
                return (h0n, c0n, h1n, c1n), h1n

            z = jnp.zeros((b, h), jnp.float32)
            _, ys = jax.lax.scan(step, (z, z, z, z), (ih0, keep))
            return ys

        ys_r = np.asarray(ref(x_tm, keep))
        ys_k = np.asarray(jax.jit(
            lambda x, k: lstm2_train_fwd_pallas(x, k, params[0], params[1])
        )(x_tm, keep)[0])
        d_t = np.abs(ys_k - ys_r).max(axis=(1, 2))
        growth[str(t)] = {
            "rel_final": round(float(d_t[-1] / max(np.abs(ys_r).max(),
                                                   1e-6)), 8),
            "absmax_t10": float(d_t[:10].max()),
            "absmax_mid": float(d_t[t // 2]),
            "absmax_last": float(d_t[-1]),
        }
        flush("divergence_vs_T", growth)

    # ---- Probe B: directional derivative of the production path ----------
    t = 375
    x_tm = jax.random.normal(ks[0], (t, b, d))
    keep = (jax.random.uniform(ks[1], (t, b, h)) > 0.2).astype(jnp.float32)
    x_bm = jnp.transpose(x_tm, (1, 0, 2))
    keep_bm = jnp.transpose(keep, (1, 0, 2))[:, :, None, :]

    lv.set_fwd_kernel_mode("auto")
    lv.set_bwd_kernel_mode("auto")

    def loss(x):
        hf = lv.fused_lstm_final(x, keep_bm, params)
        return jnp.sum(hf * jnp.sin(hf)) / (b * h)

    loss_j = jax.jit(loss)
    grad_j = jax.jit(jax.grad(loss))
    v = jax.random.normal(ks[6], x_bm.shape)
    v = v / jnp.linalg.norm(v)
    g = grad_j(x_bm)
    directional = float(jnp.vdot(g, v))
    checks = {}
    for eps in (1e-2, 3e-3, 1e-3):
        fd = float((loss_j(x_bm + eps * v) - loss_j(x_bm - eps * v))
                   / (2 * eps))
        checks[f"eps_{eps}"] = {
            "fd": fd, "grad_dot_v": directional,
            "rel": round(abs(fd - directional) / max(abs(fd), 1e-9), 6),
        }
        flush("directional_derivative", checks)

    # control: the pure-XLA path must pass the same check
    lv.set_fwd_kernel_mode("off")
    lv.set_bwd_kernel_mode("off")
    loss_x = jax.jit(loss)
    grad_x = jax.jit(jax.grad(loss))
    gx = grad_x(x_bm)
    dir_x = float(jnp.vdot(gx, v))
    fd_x = float((loss_x(x_bm + 1e-2 * v) - loss_x(x_bm - 1e-2 * v)) / 2e-2)
    flush("directional_derivative_xla", {
        "fd": fd_x, "grad_dot_v": dir_x,
        "rel": round(abs(fd_x - dir_x) / max(abs(fd_x), 1e-9), 6),
    })


if __name__ == "__main__":
    main()
