"""r2n: fused 2-layer LSTM backward kernel — on-chip parity + A/B.

1. Gradient parity of the fused reverse kernel vs the XLA scan backward
   at the flagship geometry (B=32, T=375, H=256) on hardware.
2. Isolated chain timing: fused kernel vs per-layer chains (+ XLA hop).
3. Full flagship train-step A/B (fused vs layered) via bench.py builders.
4. BWD2_CHUNK sweep.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2n_tpu.json"
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


def timed(jfn, *args, iters=30, reps=3):
    import jax
    import jax.numpy as jnp

    val = jfn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(val)[0]))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            val = jfn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(val)[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return round(best * 1e3, 4)


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops import lstm_kernel as lk
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_lstm,
        set_bwd_kernel_mode,
    )

    flush("platform", jax.default_backend())

    # --- 1. on-chip gradient parity: fused kernel vs XLA scan -------------
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

    def loss(x, keep, params):
        ys, hf = fused_lstm(x, keep, params)
        return jnp.sum(ys * jnp.sin(ys)) + jnp.sum(hf ** 2)

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 2)))
    prev = set_bwd_kernel_mode("off")
    try:
        g_scan = jax.tree_util.tree_map(np.asarray, grad_fn(x, keep, params))
    finally:
        set_bwd_kernel_mode(prev)
    g_kern = jax.tree_util.tree_map(np.asarray, grad_fn(x, keep, params))
    rels = []
    for a, b_ in zip(jax.tree_util.tree_leaves(g_scan),
                     jax.tree_util.tree_leaves(g_kern)):
        denom = np.maximum(np.abs(a).max(), 1e-6)
        rels.append(float(np.abs(a - b_).max() / denom))
    flush("fused_bwd_parity", {"max_rel": max(rels),
                               "pass": max(rels) < 1e-4})

    # --- 2. isolated chain: fused vs layered -------------------------------
    g0 = jax.random.normal(ks[0], (t, b, 4 * h))
    g1 = jax.random.normal(ks[1], (t, b, 4 * h))
    cp0 = jax.random.normal(ks[2], (t, b, h))
    cp1 = jax.random.normal(ks[3], (t, b, h))
    dys = 0.1 * jax.random.normal(ks[4], (t, b, h))
    km = jnp.ones((t, b, h), jnp.float32)
    dhf = jax.random.normal(ks[5], (b, h))
    w_hh0, w_hh1, w_ih1 = params[0]["w_hh"], params[1]["w_hh"], params[1]["w_ih"]

    fused = jax.jit(lambda *a: lk.lstm2_bwd_chain_pallas(*a))

    def layered(g0, g1, cp0, cp1, dys, km, dhf, w_hh0, w_hh1, w_ih1):
        dg1 = lk.lstm_bwd_chain_pallas(g1, cp1, dys, dhf, w_hh1)
        dx1 = (dg1.reshape(-1, 4 * h) @ w_ih1.T).reshape(t, b, h)
        dg0 = lk.lstm_bwd_chain_pallas(g0, cp0, dx1 * km,
                                       jnp.zeros((b, h)), w_hh0)
        return dg0, dg1

    args = (g0, g1, cp0, cp1, dys, km, dhf, w_hh0, w_hh1, w_ih1)
    flush("chain_ms", {
        "fused": timed(fused, *args),
        "layered": timed(jax.jit(layered), *args),
    })

    # --- 3. BWD2_CHUNK sweep on the isolated fused chain -------------------
    sweep = {}
    for chunk in (2, 4, 6):
        if not lk.bwd2_kernel_supported(b, t, h, chunk=chunk):
            sweep[str(chunk)] = None
            continue
        jfn = jax.jit(lambda *a, c=chunk: lk.lstm2_bwd_chain_pallas(
            *a, chunk=c))
        sweep[str(chunk)] = timed(jfn, *args)
    flush("chunk_sweep_ms", sweep)

    # --- 4. full flagship train step A/B ------------------------------------
    from bench import _build, _time_steps

    def step_cps():
        state, step, feats, labels = _build("logmel_cached", 32, 256)
        cps, _ = _time_steps(state, step, feats, labels, 32, 256, 3, 30)
        return round(cps, 1)

    real_supported = lk.bwd2_kernel_supported
    try:
        lk.bwd2_kernel_supported = lambda *a, **k: False
        cps_layered = step_cps()
    finally:
        lk.bwd2_kernel_supported = real_supported
    cps_fused = step_cps()
    flush("flagship_ab", {"layered": cps_layered, "fused": cps_fused,
                          "speedup": round(cps_fused / cps_layered, 4)})


if __name__ == "__main__":
    main()
