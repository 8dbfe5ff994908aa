"""Round-2c TPU batch: b256 validation after the hf_ref tile-store fix.

1. tiled_parity — B=256 grads, both kernels vs both scans, on chip.
2. peak_ab      — b256 bf16 train step, kernels off vs auto.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2c_tpu.json"
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
    signal.alarm(seconds)


def section_tiled_parity():
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_lstm,
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    b, t, d, h = 256, 50, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, t, d))
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.1).astype(jnp.float32)
    params = tuple(
        {
            "w_ih": 0.2 * jax.random.normal(ks[2 + 2 * l],
                                            (d if l == 0 else h, 4 * h)),
            "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * l], (h, 4 * h)),
            "b": jnp.zeros((4 * h,)),
        }
        for l in range(2)
    )

    def loss(x, keep, params):
        ys, h_final = fused_lstm(x, keep, params)
        return jnp.sum(ys * jnp.cos(ys)) + jnp.sum(h_final ** 2)

    vg = jax.value_and_grad(loss, argnums=(0, 2))
    set_fwd_kernel_mode("off")
    set_bwd_kernel_mode("off")
    val_s, g_s = jax.jit(vg)(x, keep, params)
    val_s, g_s = float(val_s), jax.tree.map(np.asarray, g_s)
    set_fwd_kernel_mode("auto")
    set_bwd_kernel_mode("auto")
    val_k, g_k = jax.jit(vg)(x, keep, params)
    val_k, g_k = float(val_k), jax.tree.map(np.asarray, g_k)
    max_rel = max(
        float(np.max(np.abs(a - bb) / np.maximum(np.abs(a), 1e-3)))
        for a, bb in zip(jax.tree_util.tree_leaves(g_s),
                         jax.tree_util.tree_leaves(g_k))
    )
    flush("tiled_parity_b256", {
        "primal_rel": abs(val_k - val_s) / max(abs(val_s), 1e-6),
        "grad_max_rel": max_rel,
        "pass": max_rel < 5e-4,
    })


def section_peak_ab():
    import bench

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    modes = {"scans": ("off", "off"), "both_kernels": ("auto", "auto")}
    built = {}
    for name, (fwd, bwd) in modes.items():
        set_fwd_kernel_mode(fwd)
        set_bwd_kernel_mode(bwd)
        built[name] = bench._build("logmel_pallas", 256, 256,
                                   compute_dtype="bfloat16")
    samples = {name: [] for name in modes}
    for rep in range(3):
        for name, (fwd, bwd) in modes.items():
            set_fwd_kernel_mode(fwd)
            set_bwd_kernel_mode(bwd)
            state, step, features, labels = built[name]
            cps, state = bench._time_steps(
                state, step, features, labels, 256, 256,
                warmup=3 if rep == 0 else 1, iters=10,
            )
            built[name] = (state, step, features, labels)
            samples[name].append(cps)
    set_fwd_kernel_mode("auto")
    set_bwd_kernel_mode("auto")
    flush("peak_ab_b256_bf16", {
        **{n: round(max(v), 2) for n, v in samples.items()},
        "samples": {k: [round(v, 1) for v in vs] for k, vs in samples.items()},
    })


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    flush("platform", jax.default_backend())
    for name, fn in [("tiled_parity", section_tiled_parity),
                     ("peak_ab", section_peak_ab)]:
        try:
            fn()
        except Exception as exc:  # noqa: BLE001
            flush(f"{name}_error", repr(exc)[:500])


if __name__ == "__main__":
    main()
