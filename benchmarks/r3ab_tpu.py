"""r3ab: in-place reverse-walk storage for the big-config LSTM scan.

r3aa found six un-elided zero-fill broadcasts ([93,4,256,2048] bf16,
~0.6 ms each) initializing the lax.scan ys stacks of the 3-layer
big-config LSTM custom VJP — three forward gate stacks, three backward
dgates stacks.  The lever (ops/lstm_vjp._bwd_scan_inplace) threads the
dead-after-read forward gate stacks through the reverse walk as carry
buffers and overwrites g_t with dg_t in place: the three backward fills
disappear and ~1.1 GB of HBM goes with them.

This probe A/Bs the full big-config epoch step (b256 bf16, the r3z
geometry) with the toggle on/off, interleaved, and counts the big
zero-fill broadcasts in both compiled HLOs.

Writes r3ab_tpu.json.
"""

import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3ab_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {str(value)[:200]}", flush=True)


def watchdog(seconds=2400):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def big_op_census(txt):
    """Histogram of >=64MB constant broadcasts and copies, by shape."""
    fills: dict = {}
    copies: dict = {}
    for m in re.finditer(
        r"= (\w+)\[([\d,]+)\][^ ]* (broadcast\(%constant|copy\()", txt
    ):
        dims = [int(d) for d in m.group(2).split(",")]
        bytes_ = int(np.prod(dims)) * (2 if m.group(1) == "bf16" else 4)
        if bytes_ < 64 * 1024 * 1024:
            continue
        shape = f"{m.group(1)}[{m.group(2)}]"
        dest = fills if m.group(3).startswith("broadcast") else copies
        dest[shape] = dest.get(shape, 0) + 1
    return {"fills": fills, "copies": copies}


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops import lstm_vjp as lv

    watchdog()
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    batch, n_rows, S = 256, 256, 8
    st, ep, feats, labels = B._build(
        "logmel_cached", batch, n_rows, compute_dtype="bfloat16",
        scan=True, big=True)
    mats = jnp.asarray(
        (np.arange(S * batch).reshape(S, batch)) % n_rows, jnp.int32)
    valid = jnp.ones((S, batch), jnp.float32)
    key = jax.random.PRNGKey(0)
    args = (st, feats, labels, mats, valid, key)

    fns, states = {}, {}
    for mode in ("off", "auto"):
        lv.set_bwd_inplace(mode)
        fn = jax.jit(lambda *a, _ep=ep: _ep(*a))
        census = big_op_census(fn.lower(*args).compile().as_text())
        flush(f"big_ops_{mode}", census)
        # warmup: 2 chained epochs + VALUE-FETCH sync (block_until_ready
        # can return early on the tunneled axon backend — see bench.py)
        s, metrics = fn(st, feats, labels, mats, valid, key)
        s, metrics = fn(s, feats, labels, mats, valid, key)
        float(metrics["loss"][-1])
        fns[mode], states[mode] = fn, s
    lv.set_bwd_inplace("auto")

    # interleaved A/B: per rep, EPOCHS chained epochs per mode, synced by
    # a value fetch off the last epoch's metrics
    EPOCHS = 4
    times = {"off": [], "auto": []}
    for rep in range(5):
        for mode in ("off", "auto"):
            s = states[mode]
            t0 = time.perf_counter()
            for _ in range(EPOCHS):
                s, metrics = fns[mode](s, feats, labels, mats, valid, key)
            float(metrics["loss"][-1])
            times[mode].append(time.perf_counter() - t0)
            states[mode] = s
    for mode in ("off", "auto"):
        med = sorted(times[mode])[len(times[mode]) // 2]
        cps = EPOCHS * S * batch / med
        flush(f"{mode}_ms_per_step_med",
              round(med / (EPOCHS * S) * 1000, 3))
        flush(f"{mode}_ms_per_step_best",
              round(min(times[mode]) / (EPOCHS * S) * 1000, 3))
        flush(f"{mode}_cps_med", round(cps, 1))
    flush("speedup_med", round(
        sorted(times["off"])[2] / sorted(times["auto"])[2], 4))


if __name__ == "__main__":
    main()
