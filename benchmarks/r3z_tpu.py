"""r3z: where does the big config's missing 60% go at its MFU-0.40 peak?

The big sweep config (LSTM x3 h512 out 256) peaks at 6,436 clips/s b256
bf16 = MFU 0.402 against an attainable ceiling of 1.0 (full MXU
occupancy at 256 rows).  This probe traces the b256-bf16 epoch-scan step
and banks the per-op table so the 60% gap is named: serial recurrence
latency vs VPU gate work vs residual/carry data movement vs the
hoisted contractions.  Extends the r3w roofline narrative to the
compute-bound family corner; if one class of op dominates it becomes a
round-4 lever.

Writes r3z_tpu.json.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3z_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {json.dumps(value)[:160]}", flush=True)


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

    watchdog()
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    batch, n_rows = 256, 256
    st, ep, feats, labels = B._build(
        "logmel_cached", batch, n_rows, compute_dtype="bfloat16",
        scan=True, big=True)
    cps, st = B._time_epoch_scan(st, ep, feats, labels, batch, n_rows,
                                 warmup=2, iters=4)
    flush("escan_big_b256_bf16_cps", round(cps, 1))

    # trace (hierarchical rows — the while.N row is the device step
    # total, its children are the per-op breakdown; see r3w note)
    S = 8
    key = jax.random.PRNGKey(0)
    mats = [jnp.asarray(
        (np.arange(S * batch).reshape(S, batch) + e) % n_rows,
        jnp.int32) for e in range(3)]
    valid = jnp.ones((S, batch), jnp.float32)
    tdir = "/tmp/r3z_trace"
    m = None
    jax.profiler.start_trace(tdir)
    for e in range(3):
        st, m = ep(st, feats, labels, mats[e], valid, key)
    float(m["loss"][-1])
    jax.profiler.stop_trace()

    n_steps = 3 * S
    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            by_name[ev.get("name", "?")] += ev["dur"]
    rows = [[n, round(us / 1e3 / n_steps, 4)]
            for n, us in sorted(by_name.items(), key=lambda kv: -kv[1])
            if us / 1e3 / n_steps >= 0.01]
    flush("all_ops_ms_per_step", rows[:50])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
