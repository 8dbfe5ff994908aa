"""r4c: per-layer Pallas kernels vs XLA scan on the big sweep config.

Round-4 verdict lever (a): the big config (LSTM x3, h512 — the model
behind every BASELINE.md number) had NO kernel route; r4b measured its
XLA scans at ~2x their serial-matmul floor at b32 f32 (fwd 3.07 ms,
bwd 3.36 ms of the 8.56 ms device step).  This probe A/Bs the new
any-depth route — per-layer forward kernels (lstm1_train_fwd_pallas)
+ the layered reverse-chain kernels now VMEM-eligible at h512 via
adaptive chunking — against the scan path (with the validated r4a
in-place storage), interleaved, at the verdict geometry b32 f32.

Also banks a loss-trajectory agreement check (6 chained epochs from the
same init) so the kernel route's numerics are sanity-gated on chip.

Writes r4c_tpu.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4c_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {str(value)[:200]}", flush=True)


def watchdog(seconds=3000):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops import lstm_vjp as lv

    watchdog()
    flush("platform", jax.default_backend())

    batch, n_rows, S = 32, 256, 8
    mats = jnp.asarray(
        (np.arange(S * batch).reshape(S, batch)) % n_rows, jnp.int32)
    valid = jnp.ones((S, batch), jnp.float32)
    key = jax.random.PRNGKey(0)

    # routing sanity: the layered forward must engage at the big geometry
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        _pick_bwd_chunk,
        _pick_fwd1_chunk,
        bwd_kernel_supported,
        fwd1_kernel_supported,
    )

    flush("fwd1_supported_b32_h512",
          fwd1_kernel_supported(32, 372, 512, f32_large=True))
    flush("fwd1_chunk", _pick_fwd1_chunk(32, 512))
    flush("bwd_supported_b32_h512",
          bwd_kernel_supported(32, 372, 512, f32_large=True))
    flush("bwd_chunk", _pick_bwd_chunk(32, 512))

    fns, states, argsets, losses = {}, {}, {}, {}
    for mode in ("scan", "kernels"):
        prev_f = lv.set_fwd_kernel_mode("off" if mode == "scan" else "auto")
        prev_b = lv.set_bwd_kernel_mode("off" if mode == "scan" else "auto")
        try:
            st, ep, feats, labels = B._build(
                "logmel_cached", batch, n_rows, compute_dtype="float32",
                scan=True, big=True)
            args = (st, feats, labels, mats, valid, key)
            txt = ep.lower(*args).compile().as_text()
            flush(f"{mode}_n_custom_calls", txt.count("custom-call"))
            # loss trajectory from the SAME init, 6 chained epochs
            s, m = ep(*args)
            traj = [float(m["loss"][-1])]
            for _ in range(5):
                s, m = ep(s, feats, labels, mats, valid, key)
                traj.append(float(m["loss"][-1]))
            losses[mode] = traj
            flush(f"{mode}_loss_traj", [round(v, 5) for v in traj])
            fns[mode], states[mode] = ep, s
            argsets[mode] = (feats, labels)
        finally:
            lv.set_fwd_kernel_mode(prev_f)
            lv.set_bwd_kernel_mode(prev_b)

    drift = max(abs(a - b) for a, b in zip(losses["scan"], losses["kernels"]))
    flush("loss_traj_max_abs_drift", round(drift, 6))

    EPOCHS = 6
    times = {"scan": [], "kernels": []}
    for rep in range(5):
        for mode in ("scan", "kernels"):
            s = states[mode]
            feats, labels = argsets[mode]
            t0 = time.perf_counter()
            for _ in range(EPOCHS):
                s, m = fns[mode](s, feats, labels, mats, valid, key)
            float(m["loss"][-1])  # VALUE-FETCH sync (see bench.py)
            times[mode].append(time.perf_counter() - t0)
            states[mode] = s
    for mode in ("scan", "kernels"):
        med = sorted(times[mode])[len(times[mode]) // 2]
        flush(f"{mode}_ms_per_step_med",
              round(med / (EPOCHS * S) * 1000, 3))
        flush(f"{mode}_ms_per_step_best",
              round(min(times[mode]) / (EPOCHS * S) * 1000, 3))
        flush(f"{mode}_cps_med", round(EPOCHS * S * batch / med, 1))
    flush("speedup_kernels_over_scan", round(
        sorted(times["scan"])[len(times["scan"]) // 2]
        / sorted(times["kernels"])[len(times["kernels"]) // 2], 4))
    # verdict metric: cps needed for mfu_big_config >= 0.30 is 4,805
    flush("mfu_big_config_kernels", round(
        (EPOCHS * S * batch / sorted(times["kernels"])[2])
        * 12299894784.0 / 197e12, 4))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
