"""r3b: lift the peak-throughput point (b256 bf16, MFU 0.237).

Levers, each an interleaved same-process A/B at the flagship model:
1. epoch-scan length: S=8 (bench default) vs 16 vs 36 (the real RAVDESS
   epoch) — does longer amortization still pay at b256?
2. batch 256 vs 512 bf16 — is the scan still latency-bound at b256?
3. f32 recurrence kernels forced ON vs OFF at b256 bf16 (r2c measured
   kernels losing there; re-check under the current driver).

Writes benchmarks/r3b_tpu.json incrementally.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench as B  # noqa: E402

OUT = Path(__file__).parent / "r3b_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:160]}", flush=True)


def time_epoch(state, estep, feats, labels, batch, n_rows, S, reps=8,
               warmup=2):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    mat = jnp.asarray(np.arange(S * batch).reshape(S, batch) % n_rows,
                      jnp.int32)
    vmat = jnp.ones((S, batch), jnp.float32)
    m = None
    for _ in range(warmup):
        state, m = estep(state, feats, labels, mat, vmat, key)
    float(m["loss"][-1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, m = estep(state, feats, labels, mat, vmat, key)
        float(m["loss"][-1])
        best = min(best, time.perf_counter() - t0)
    return S * batch / best, state  # donated input: caller must rebind


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    # ---- 1: epoch-scan length at b256 bf16 ----
    built = B._build("logmel_cached", 256, 256, compute_dtype="bfloat16",
                     scan=True)
    state, estep, feats, labels = built
    for S in (8, 16, 36):
        cps, state = time_epoch(state, estep, feats, labels, 256, 256, S)
        flush(f"b256_bf16_S{S}_cps", round(cps, 1))

    # ---- 2: batch 512 bf16 (n_rows 512) ----
    try:
        state5, estep5, feats5, labels5 = B._build(
            "logmel_cached", 512, 512, compute_dtype="bfloat16", scan=True)
        cps, state5 = time_epoch(state5, estep5, feats5, labels5, 512,
                                 512, 8, reps=6)
        flush("b512_bf16_S8_cps", round(cps, 1))
        cps, state5 = time_epoch(state5, estep5, feats5, labels5, 512,
                                 512, 16, reps=4)
        flush("b512_bf16_S16_cps", round(cps, 1))
    except Exception as e:  # noqa: BLE001
        flush("b512_error", repr(e))

    # ---- 3: kernels on/off at b256 bf16 (interleaved rebuilds) ----
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    for mode, tag in (("force", "on"), ("off", "off"), ("force", "on2"),
                      ("off", "off2")):
        real = "auto" if mode == "force" else "off"
        set_fwd_kernel_mode(real)
        set_bwd_kernel_mode(real)
        st, es, ft, lb = B._build("logmel_cached", 256, 256,
                                  compute_dtype="bfloat16", scan=True)
        cps, st = time_epoch(st, es, ft, lb, 256, 256, 8, reps=6)
        flush(f"b256_bf16_kernels_{tag}_cps", round(cps, 1))
    set_fwd_kernel_mode("auto")
    set_bwd_kernel_mode("auto")

    jax.config.update("jax_default_prng_impl", "threefry2x32")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
