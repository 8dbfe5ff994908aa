"""r4f: transformer family step decomposition at its best regime.

Round-4 verdict item 2: bench.py now banks mfu_transformer against the
honest attainable ceiling (scores/AV at head_dim/128 = 0.5 MXU
occupancy -> attainable 0.84).  r3y measured 15.1k clips/s bf16 = MFU
0.346 = 41% of that ceiling, so headroom exists on paper; this probe
traces the exact bench leg (b32 bf16, rbg, epoch-scan driver) and banks
the per-op table so the gap is named — the verdict's candidate levers
(pos-emb/pooling epilogue folding, batch retune) get adjudicated by
data, not guesswork.

Writes r4f_tpu.json.
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
                   "r4f_tpu.json")
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
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    batch, n_rows = 32, 256
    st, ep, feats, labels = B._build(
        "logmel_cached", batch, n_rows, compute_dtype="bfloat16",
        scan=True, encoder="transformer")
    cps, st = B._time_epoch_scan(st, ep, feats, labels, batch, n_rows,
                                 warmup=2, iters=8)
    flush("escan_transformer_b32_bf16_cps", round(cps, 1))
    flush("ms_per_step", round(batch / cps * 1000, 3))

    S = 8
    key = jax.random.PRNGKey(0)
    mats = [jnp.asarray(
        (np.arange(S * batch).reshape(S, batch) + e) % n_rows,
        jnp.int32) for e in range(3)]
    valid = jnp.ones((S, batch), jnp.float32)
    tdir = "/tmp/r4f_trace"
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
            if us / 1e3 / n_steps >= 0.005]
    flush("all_ops_ms_per_step", rows[:70])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
