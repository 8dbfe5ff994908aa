"""r3i: op-level attribution of the FAST-mode flagship step (rbg PRNG +
bf16 residual streams), after r3g/r3h landed the levers.

The r3f trace attributed the pre-lever step (0.94 ms device: kernels
0.47 ms, ~0.25 ms fusions, PRNG ~6%).  This re-traces the fast-mode
epoch-scan program and banks the top ops, so the next lever is picked on
current evidence (candidates: software-pipelined fwd kernel — layer0(t+1)
overlapping layer1(t) to hide the dependent-matmul latency; contraction
layout; optimizer fusion).  Also times an EMPTY chained-harness control to
calibrate the isolated-component floor that muddied r3f's video numbers.

Writes r3i_tpu.json incrementally; trace parsed from trace.json.gz.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from benchmarks.r3f_tpu import build_flagship  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3i_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {json.dumps(value)[:200]}", flush=True)


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

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    watchdog()
    flush("platform", jax.default_backend())

    # ---- harness-floor control: empty apply through chained_ms ----
    from benchmarks.r3a_tpu import chained_ms

    rng = np.random.RandomState(0)
    xv = jnp.asarray(rng.rand(32, 24, 4096), jnp.float32)
    flush("harness_floor_identity_ms",
          round(chained_ms(lambda v, x: x * v, jnp.float32(1.0), xv), 4))

    # ---- fast-mode step + trace ----
    lv.set_res2_dtype("bfloat16")
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        st, ep, feats, labels, *_ = build_flagship()
        key = jax.random.PRNGKey(0)
        S, Bsz = 8, 32
        mats = [jnp.asarray(
            (np.arange(S * Bsz).reshape(S, Bsz) + e * S * Bsz) % 256,
            jnp.int32) for e in range(13)]
        vmat = jnp.ones((S, Bsz), jnp.float32)
        for e in range(3):
            st, m = ep(st, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        # in-session rate for context
        t0 = time.perf_counter()
        for e in range(3, 11):
            st, m = ep(st, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        flush("escan_b32_fast_cps",
              round(8 * S * Bsz / (time.perf_counter() - t0), 1))

        jax.profiler.start_trace("/tmp/r3i_trace")
        for e in range(3, 13):
            st, m = ep(st, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        jax.profiler.stop_trace()
        flush("trace", "/tmp/r3i_trace")

        paths = glob.glob("/tmp/r3i_trace/plugins/profile/*/*.trace.json.gz")
        with gzip.open(sorted(paths)[-1], "rt") as f:
            trace = json.load(f)
        by_name = defaultdict(float)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                by_name[ev.get("name", "?")] += ev["dur"]
        top = sorted(by_name.items(), key=lambda kv: -kv[1])[:30]
        flush("trace_top_ops_ms_per_step",
              [[n, round(us / 1e3 / 80, 4)] for n, us in top])
    finally:
        lv.set_res2_dtype("float32")
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
