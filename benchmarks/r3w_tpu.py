"""r3w: full op-level decomposition of the fast-config flagship step.

After r3c/r3g/r3j the device step is ~0.9 ms with the two recurrence
kernels at ~0.35-0.47 ms — what exactly is the OTHER half?  This probe
traces the production epoch-scan step under the fast knobs (rbg PRNG +
bf16 residual streams) and emits EVERY op inside the while body above
1 µs/step, so the remaining time is named op-by-op (video encoder dense,
attention pool, head, loss, optimizer, PRNG, batch gather) instead of
"the rest".  Evidence for the DESIGN.md speed-of-light narrative; if one
op stands out it becomes the next lever.

Writes r3w_tpu.json.
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
from benchmarks.r3f_tpu import build_flagship  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3w_tpu.json")
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

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    watchdog()
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())

    jax.config.update("jax_default_prng_impl", "rbg")
    lv.set_res2_dtype("bfloat16")
    try:
        st, ep, feats, labels, *_ = build_flagship()
        cps, st = B._time_epoch_scan(st, ep, feats, labels, 32, 256,
                                     warmup=2, iters=6)
        flush("escan_fast_cps", round(cps, 1))

        import jax.numpy as jnp

        tdir = "/tmp/r3w_trace"
        n_epochs, steps_per_epoch = 10, 8
        S, Bb = steps_per_epoch, 32
        key = jax.random.PRNGKey(0)
        mats = [jnp.asarray(
            (np.arange(S * Bb).reshape(S, Bb) + e * S * Bb) % 256,
            jnp.int32) for e in range(n_epochs)]
        valid = jnp.ones((S, Bb), jnp.float32)
        m = None
        jax.profiler.start_trace(tdir)
        for e in range(n_epochs):
            st, m = ep(st, feats, labels, mats[e], valid, key)
        float(m["loss"][-1])
        jax.profiler.stop_trace()
    finally:
        lv.set_res2_dtype("float32")
        jax.config.update("jax_default_prng_impl", "threefry2x32")

    n_steps = n_epochs * steps_per_epoch
    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    # NO filtering: host/runtime rows and umbrella events (the jit entry,
    # the while body) appear alongside their children, so rows must be
    # read hierarchically — the while.N row IS the device step total; the
    # rnn/fusion rows are its children and sum to (at most) it; rows above
    # the while are host-side wrappers of the same time.
    by_name = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            by_name[ev.get("name", "?")] += ev["dur"]
    rows = [[n, round(us / 1e3 / n_steps, 4)]
            for n, us in sorted(by_name.items(), key=lambda kv: -kv[1])
            if us / 1e3 / n_steps >= 0.001]
    flush("all_ops_ms_per_step", rows[:60])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
