"""r3e: does hoisting the per-step batch gather out of the epoch scan
(runtime.epoch_pregather) buy back the gather DMA the r3a trace showed on
the step's critical path (slice-done.29, 0.129 ms = 7.6% of the pre-v2
step)?

One big HBM gather per epoch (then contiguous scan slices) vs S small
gathers inside the scan.  Bitwise-identical trajectories (CI:
tests/test_train.py::test_epoch_pregather_matches_in_scan_gather); this
probe is purely about the gather schedule.

Interleaved same-process A/Bs at the REAL flagship epoch geometry
(n_rows=1152, S=36, b32 f32) and the peak regime (b256 bf16, S=4).
Writes benchmarks/r3e_tpu.json incrementally.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench as B  # noqa: E402

OUT = Path(__file__).parent / "r3e_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:160]}", flush=True)


def time_epoch(state, estep, feats, labels, batch, n_rows, S, reps=6,
               warmup=2, seed=0):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(S * batch) % n_rows
    mat = jnp.asarray(perm.reshape(S, batch), jnp.int32)
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
    return S * batch / best, state


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    flush("platform", jax.default_backend())

    # ---- flagship b32 f32, real epoch geometry (1152 rows, 36 steps) ----
    st_a, ep_a, feats, labels = B._build(
        "logmel_cached", 32, 1152, scan=True, pregather=False)
    st_b, ep_b, feats_b, labels_b = B._build(
        "logmel_cached", 32, 1152, scan=True, pregather=True)
    for rnd in (1, 2):
        cps, st_a = time_epoch(st_a, ep_a, feats, labels, 32, 1152, 36)
        flush(f"flagship_b32_gather_in_scan_r{rnd}_cps", round(cps, 1))
        cps, st_b = time_epoch(st_b, ep_b, feats_b, labels_b, 32, 1152, 36)
        flush(f"flagship_b32_pregather_r{rnd}_cps", round(cps, 1))

    # ---- peak regime b256 bf16 (4 steps of 256 over the same split) ----
    st_c, ep_c, feats_c, labels_c = B._build(
        "logmel_cached", 256, 1152, compute_dtype="bfloat16", scan=True,
        pregather=False)
    st_d, ep_d, feats_d, labels_d = B._build(
        "logmel_cached", 256, 1152, compute_dtype="bfloat16", scan=True,
        pregather=True)
    for rnd in (1, 2):
        cps, st_c = time_epoch(st_c, ep_c, feats_c, labels_c, 256, 1152, 4)
        flush(f"peak_b256_bf16_gather_in_scan_r{rnd}_cps", round(cps, 1))
        cps, st_d = time_epoch(st_d, ep_d, feats_d, labels_d, 256, 1152, 4)
        flush(f"peak_b256_bf16_pregather_r{rnd}_cps", round(cps, 1))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
