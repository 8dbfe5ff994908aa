"""Round-2k TPU batch: vmap-over-kernels on-chip validation (LR-sweep path)."""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2k_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def main():
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", "unresponsive")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(1800)

    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_lstm,
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    flush("platform", jax.default_backend())
    set_fwd_kernel_mode("auto")
    set_bwd_kernel_mode("auto")

    b, t, d, h = 32, 96, 16, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    xs = jax.random.normal(ks[0], (3, b, t, d))  # 3 sweep members
    keep = jnp.ones((b, t, 1, h), jnp.float32)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[1 + 2 * l],
                                         (d if l == 0 else h, 4 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[2 + 2 * l], (h, 4 * h)),
         "b": jnp.zeros((4 * h,))}
        for l in range(2)
    )

    def loss(x):
        ys, hf = fused_lstm(x, keep, params)
        return jnp.sum(jnp.sin(ys)) + jnp.sum(hf ** 2)

    try:
        g_vmap = np.asarray(jax.jit(jax.vmap(jax.grad(loss)))(xs))
        g_loop = np.stack([
            np.asarray(jax.jit(jax.grad(loss))(xs[i])) for i in range(3)
        ])
        err = float(np.max(np.abs(g_vmap - g_loop)))
        flush("vmap_over_kernels", {"max_abs_err": err, "pass": err < 1e-4})
    except Exception as exc:  # noqa: BLE001
        flush("vmap_over_kernels_error", repr(exc)[:500])


if __name__ == "__main__":
    main()
