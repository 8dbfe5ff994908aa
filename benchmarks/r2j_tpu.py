"""Round-2j TPU batch: BWD_CHUNK 8-vs-16 A/B in the full cached train step
+ final parity re-confirmation at the tuned chunk."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2j_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def watchdog(seconds=2400):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(2400)


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import bench
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops import lstm_kernel as lk
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_lstm,
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    flush("platform", jax.default_backend())
    set_fwd_kernel_mode("auto")
    set_bwd_kernel_mode("auto")

    # parity at the tuned chunk (16), flagship geometry, on chip
    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, t, d))
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.1).astype(jnp.float32)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[2 + 2 * l],
                                         (d if l == 0 else h, 4 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * l], (h, 4 * h)),
         "b": jnp.zeros((4 * h,))}
        for l in range(2)
    )

    def loss(x, keep, params):
        ys, hf = fused_lstm(x, keep, params)
        return jnp.sum(ys * jnp.cos(ys)) + jnp.sum(hf ** 2)

    vg = jax.value_and_grad(loss, argnums=(0, 2))
    set_bwd_kernel_mode("off")
    set_fwd_kernel_mode("off")
    _, g_s = jax.jit(vg)(x, keep, params)
    g_s = jax.tree.map(np.asarray, g_s)
    set_bwd_kernel_mode("auto")
    set_fwd_kernel_mode("auto")
    lk.BWD_CHUNK = 16
    _, g_k = jax.jit(vg)(x, keep, params)
    g_k = jax.tree.map(np.asarray, g_k)
    max_rel = max(
        float(np.max(np.abs(a - bb) / np.maximum(np.abs(a), 1e-3)))
        for a, bb in zip(jax.tree_util.tree_leaves(g_s),
                         jax.tree_util.tree_leaves(g_k))
    )
    flush("parity_chunk16", {"grad_max_rel": max_rel,
                             "pass": max_rel < 5e-4})

    # full cached train step: BWD_CHUNK 8 vs 16
    built = {}
    for name, c in (("chunk8", 8), ("chunk16", 16)):
        lk.BWD_CHUNK = c
        built[name] = bench._build("logmel_cached", 32, 256)
    samples = {n: [] for n in built}
    for rep in range(3):
        for name, c in (("chunk8", 8), ("chunk16", 16)):
            lk.BWD_CHUNK = c
            state, step, features, labels = built[name]
            cps, state = bench._time_steps(
                state, step, features, labels, 32, 256,
                warmup=3 if rep == 0 else 1, iters=30,
            )
            built[name] = (state, step, features, labels)
            samples[name].append(cps)
    lk.BWD_CHUNK = 16
    flush("step_ab_bwd_chunk", {
        **{n: round(max(v), 2) for n, v in samples.items()},
        "samples": {k: [round(v, 1) for v in vs]
                    for k, vs in samples.items()},
    })


if __name__ == "__main__":
    main()
