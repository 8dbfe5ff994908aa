"""Round-2i TPU batch: chunk-size tuning for the training recurrence kernels.

Sweeps the HBM-streaming chunk length of the LSTM fwd/bwd chain kernels
at the flagship geometry (B=32, T=375, H=256); min-of-3x30 per point.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2i_tpu.json"
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

    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_train_fwd_pallas,
        lstm_bwd_chain_pallas,
    )

    flush("platform", jax.default_backend())
    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x_tm = jax.random.normal(ks[0], (t, b, d))
    keep = jnp.ones((t, b, h), jnp.float32)
    l0 = {"w_ih": 0.2 * jax.random.normal(ks[1], (d, 4 * h)),
          "w_hh": 0.2 * jax.random.normal(ks[2], (h, 4 * h)),
          "b": jnp.zeros((4 * h,))}
    l1 = {"w_ih": 0.2 * jax.random.normal(ks[3], (h, 4 * h)),
          "w_hh": 0.2 * jax.random.normal(ks[4], (h, 4 * h)),
          "b": jnp.zeros((4 * h,))}
    g_s = jax.random.normal(ks[5], (t, b, 4 * h))
    c_s = jax.random.normal(ks[0], (t, b, h))
    dh_s = jax.random.normal(ks[1], (t, b, h)) * 0.1
    dhf = jax.random.normal(ks[2], (b, h))

    def timed(fn, *args):
        jfn = jax.jit(fn)
        val = jfn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(val)[0]))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(30):
                val = jfn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(val)[0]))
            best = min(best, (time.perf_counter() - t0) / 30)
        return round(best * 1e3, 4)

    fwd = {}
    for chunk in (2, 4, 8, 16):
        try:
            fwd[f"chunk{chunk}"] = timed(
                lambda x: lstm2_train_fwd_pallas(x, keep, l0, l1,
                                                 chunk=chunk)[1], x_tm)
        except Exception as exc:  # noqa: BLE001
            fwd[f"chunk{chunk}"] = f"error: {repr(exc)[:150]}"
        flush("fwd_chunk_ms", fwd)

    bwd = {}
    for chunk in (4, 8, 16, 25):
        try:
            bwd[f"chunk{chunk}"] = timed(
                lambda g: lstm_bwd_chain_pallas(g, c_s, dh_s, dhf,
                                                l0["w_hh"], chunk=chunk),
                g_s)
        except Exception as exc:  # noqa: BLE001
            bwd[f"chunk{chunk}"] = f"error: {repr(exc)[:150]}"
        flush("bwd_chunk_ms", bwd)


if __name__ == "__main__":
    main()
