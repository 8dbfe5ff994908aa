"""Round-2h TPU batch: GRU training-forward kernel on-chip validation + A/B."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2h_tpu.json"
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


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_gru,
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    flush("platform", jax.default_backend())

    # ---- on-chip parity, flagship geometry ----
    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(2), 8)
    x = jax.random.normal(ks[0], (b, t, d))
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.1).astype(jnp.float32)
    params = tuple(
        {
            "w_ih": 0.2 * jax.random.normal(ks[2 + 3 * l],
                                            (d if l == 0 else h, 3 * h)),
            "w_hh": 0.2 * jax.random.normal(ks[3 + 3 * l], (h, 3 * h)),
            "b_ih": 0.1 * jax.random.normal(ks[4 + 3 * l], (3 * h,)),
            "b_hh": jnp.zeros((3 * h,)),
        }
        for l in range(2)
    )

    def loss(x, keep, params):
        ys, h_final = fused_gru(x, keep, params)
        return jnp.sum(ys * jnp.cos(ys)) + jnp.sum(h_final ** 2)

    vg = jax.value_and_grad(loss, argnums=(0, 2))
    try:
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
        flush("gru_fwd_parity", {
            "primal_rel": abs(val_k - val_s) / max(abs(val_s), 1e-6),
            "grad_max_rel": max_rel,
            "pass": max_rel < 5e-4,
        })
    except Exception as exc:  # noqa: BLE001
        flush("gru_fwd_parity_error", repr(exc)[:500])

    # ---- A/B: GRU-encoder train step, bwd-kernel-only vs both ----
    try:
        import bench

        sys.path.insert(0, str(Path(__file__).parent))
        from r2d_tpu import _build_gru

        modes = {"bwd_only": ("off", "auto"), "both": ("auto", "auto")}
        built = {}
        for name, (fm, bm) in modes.items():
            set_fwd_kernel_mode(fm)
            set_bwd_kernel_mode(bm)
            built[name] = _build_gru(bm, 32, 256)
            # _build_gru sets fwd off internally; re-assert for this variant
            set_fwd_kernel_mode(fm)
        samples = {name: [] for name in modes}
        for rep in range(3):
            for name, (fm, bm) in modes.items():
                set_fwd_kernel_mode(fm)
                set_bwd_kernel_mode(bm)
                state, step, features, labels = built[name]
                cps, state = bench._time_steps(
                    state, step, features, labels, 32, 256,
                    warmup=3 if rep == 0 else 1, iters=30,
                )
                built[name] = (state, step, features, labels)
                samples[name].append(cps)
        set_fwd_kernel_mode("auto")
        set_bwd_kernel_mode("auto")
        flush("gru_ab_fwd", {
            **{n: round(max(v), 2) for n, v in samples.items()},
            "samples": {k: [round(v, 1) for v in vs]
                        for k, vs in samples.items()},
        })
    except Exception as exc:  # noqa: BLE001
        flush("gru_ab_error", repr(exc)[:500])


if __name__ == "__main__":
    main()
