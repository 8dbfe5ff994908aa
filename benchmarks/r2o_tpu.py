"""r2o: full chunk-loop unroll A/B for the training recurrence kernels.

The inference kernel already wins 15% from full unroll; measure the same
lever on the training forward (chunk=4) and fused backward (chunk=4) at
the flagship geometry, isolated and in the full train step.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2o_tpu.json"
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

    flush("platform", jax.default_backend())
    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x_tm = jax.random.normal(ks[0], (t, b, d))
    keep = jnp.ones((t, b, h), jnp.float32)
    l0 = {"w_ih": 0.2 * jax.random.normal(ks[1], (d, 4 * h)),
          "w_hh": 0.2 * jax.random.normal(ks[2], (h, 4 * h)),
          "b": jnp.zeros((4 * h,))}
    l1 = {"w_ih": 0.2 * jax.random.normal(ks[3], (h, 4 * h)),
          "w_hh": 0.2 * jax.random.normal(ks[4], (h, 4 * h)),
          "b": jnp.zeros((4 * h,))}

    # --- isolated training forward --------------------------------------
    fwd = {}
    for unroll in (False, True):
        jfn = jax.jit(lambda x, k, u=unroll: lk.lstm2_train_fwd_pallas(
            x, k, l0, l1, full_unroll=u))
        fwd[f"unroll_{unroll}"] = timed(jfn, x_tm, keep)
    flush("fwd_train_ms", fwd)

    # --- isolated fused backward -----------------------------------------
    g0 = jax.random.normal(ks[0], (t, b, 4 * h))
    g1 = jax.random.normal(ks[1], (t, b, 4 * h))
    cp0 = jax.random.normal(ks[2], (t, b, h))
    cp1 = jax.random.normal(ks[3], (t, b, h))
    dys = 0.1 * jax.random.normal(ks[4], (t, b, h))
    dhf = jax.random.normal(ks[5], (b, h))
    args = (g0, g1, cp0, cp1, dys, keep, dhf,
            l0["w_hh"], l1["w_hh"], l1["w_ih"])
    bwd = {}
    for unroll in (False, True):
        jfn = jax.jit(lambda *a, u=unroll: lk.lstm2_bwd_chain_pallas(
            *a, full_unroll=u))
        bwd[f"unroll_{unroll}"] = timed(jfn, *args)
    flush("bwd2_ms", bwd)

    # parity of the unrolled variants vs rolled
    f_r = jax.jit(lambda x, k: lk.lstm2_train_fwd_pallas(
        x, k, l0, l1, full_unroll=False))(x_tm, keep)
    f_u = jax.jit(lambda x, k: lk.lstm2_train_fwd_pallas(
        x, k, l0, l1, full_unroll=True))(x_tm, keep)
    d1 = max(float(jnp.abs(a - b_).max()) for a, b_ in zip(f_r, f_u))
    b_r = jax.jit(lambda *a: lk.lstm2_bwd_chain_pallas(
        *a, full_unroll=False))(*args)
    b_u = jax.jit(lambda *a: lk.lstm2_bwd_chain_pallas(
        *a, full_unroll=True))(*args)
    d2 = max(float(jnp.abs(a - b_).max()) for a, b_ in zip(b_r, b_u))
    flush("unroll_parity_max_abs", {"fwd": d1, "bwd": d2})

    # --- full train step with the best combo ------------------------------
    from bench import _build, _time_steps

    def step_cps():
        state, step, feats, labels = _build("logmel_cached", 32, 256)
        cps, _ = _time_steps(state, step, feats, labels, 32, 256, 3, 30)
        return round(cps, 1)

    combos = {}
    for fu in (False, True):
        for bu in (False, True):
            lk.FWD_TRAIN_UNROLL, lk.BWD2_UNROLL = fu, bu
            combos[f"fwd{int(fu)}_bwd{int(bu)}"] = step_cps()
            flush("flagship_combo", combos)
    lk.FWD_TRAIN_UNROLL = lk.BWD2_UNROLL = False


if __name__ == "__main__":
    main()
