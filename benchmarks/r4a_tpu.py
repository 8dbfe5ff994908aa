"""r4a: VALID A/B of the in-place reverse-walk storage (_BWD_INPLACE).

Supersedes r3ab, whose A/B was invalid: it wrapped one pre-built
jax.jit epoch step and toggled the trace-time global around re-jitting
the wrapper — the inner jit's trace cache served the 'off' jaxpr to
both modes, so both censuses and both timings measured the SAME
program (advisor finding, round 3).

This probe rebuilds the step from scratch inside the mode loop (fresh
jit objects → fresh traces) and ASSERTS the two compiled HLOs differ
before timing.  Geometries: the big sweep config (LSTM×3 h512) at
b256 bf16 (the r3aa fill-census geometry) and b32 f32 (the
mfu_big_config geometry the round-4 verdict targets).

Writes r4a_tpu.json.
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
                   "r4a_tpu.json")
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


def big_op_census(txt, min_mb=48):
    """Histogram of large constant broadcasts and copies, by shape."""
    fills: dict = {}
    copies: dict = {}
    for m in re.finditer(
        r"= (\w+)\[([\d,]+)\][^ ]* (broadcast\(%constant|copy\()", txt
    ):
        dims = [int(d) for d in m.group(2).split(",")]
        bytes_ = int(np.prod(dims)) * (2 if m.group(1) == "bf16" else 4)
        if bytes_ < min_mb * 1024 * 1024:
            continue
        shape = f"{m.group(1)}[{m.group(2)}]"
        dest = fills if m.group(3).startswith("broadcast") else copies
        dest[shape] = dest.get(shape, 0) + 1
    return {"fills": fills, "copies": copies}


def run_geometry(tag, batch, dtype, epochs, reps):
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops import lstm_vjp as lv

    n_rows, S = max(batch, 256), 8
    mats = jnp.asarray(
        (np.arange(S * batch).reshape(S, batch)) % n_rows, jnp.int32)
    valid = jnp.ones((S, batch), jnp.float32)
    key = jax.random.PRNGKey(0)

    fns, states, argsets, hlos = {}, {}, {}, {}
    for mode in ("off", "auto"):
        # rebuild EVERYTHING under the mode so the trace is fresh —
        # make_epoch_train_step returns a new jax.jit object per call
        prev = lv.set_bwd_inplace(mode)
        try:
            st, ep, feats, labels = B._build(
                "logmel_cached", batch, n_rows, compute_dtype=dtype,
                scan=True, big=True)
            args = (st, feats, labels, mats, valid, key)
            hlo = ep.lower(*args).compile().as_text()
            hlos[mode] = hlo
            flush(f"{tag}_big_ops_{mode}", big_op_census(hlo))
            s, metrics = ep(*args)
            s, metrics = ep(s, feats, labels, mats, valid, key)
            float(metrics["loss"][-1])  # VALUE-FETCH sync (see bench.py)
            fns[mode], states[mode] = ep, s
            argsets[mode] = (feats, labels)
        finally:
            lv.set_bwd_inplace(prev)

    if hlos["off"] == hlos["auto"]:
        flush(f"{tag}_error", "HLOs identical — A/B invalid, not timing")
        return
    flush(f"{tag}_hlos_differ", True)

    times = {"off": [], "auto": []}
    for rep in range(reps):
        for mode in ("off", "auto"):
            s = states[mode]
            feats, labels = argsets[mode]
            t0 = time.perf_counter()
            for _ in range(epochs):
                s, metrics = fns[mode](s, feats, labels, mats, valid, key)
            float(metrics["loss"][-1])
            times[mode].append(time.perf_counter() - t0)
            states[mode] = s
    for mode in ("off", "auto"):
        med = sorted(times[mode])[len(times[mode]) // 2]
        flush(f"{tag}_{mode}_ms_per_step_med",
              round(med / (epochs * S) * 1000, 3))
        flush(f"{tag}_{mode}_ms_per_step_best",
              round(min(times[mode]) / (epochs * S) * 1000, 3))
        flush(f"{tag}_{mode}_cps_med",
              round(epochs * S * batch / med, 1))
    flush(f"{tag}_speedup_auto_over_off", round(
        sorted(times["off"])[len(times["off"]) // 2]
        / sorted(times["auto"])[len(times["auto"]) // 2], 4))


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    watchdog()
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    # the verdict-target geometry first (b32 f32, plain knobs except the
    # PRNG — rbg keeps probe wall-time sane and is recurrence-neutral)
    run_geometry("b32f32", 32, "float32", epochs=6, reps=5)
    run_geometry("b256bf16", 256, "bfloat16", epochs=4, reps=5)


if __name__ == "__main__":
    main()
