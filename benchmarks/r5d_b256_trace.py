"""r5d: adjudicate the flagship b256-bf16 anti-scaling (round-5 item 4).

BENCH_r04: mfu_peak_b256_bf16 0.2142 vs 0.3969 at b32 — 8x the batch in
a cheaper dtype HALVES utilization, with no banked explanation.  This
probe re-times the exact bench leg (logmel_cached, b256, n_rows=256,
bf16, rbg, epoch-scan driver), traces it with the r4f methodology, and
banks the per-op table plus the two-sided ceiling so the cause is a
number, not a narrative.  Candidate causes it separates:

  * per-layer training kernels are f32-gated at large batch -> the b256
    leg rides XLA scans (the slow route r4c beat by 59% at the big
    geometry) while b32 rides the Pallas kernels;
  * n_rows=256 at b256 means every step gathers the WHOLE resident
    split — gather/copy bytes scale with batch;
  * bf16 halves matmul time but not scan/elementwise overhead, so the
    non-MXU fraction doubles relatively (Amdahl).

Writes r5d_b256_trace.json.
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
                   "r5d_b256_trace.json")
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

    batch, n_rows = 256, 256
    st, ep, feats, labels = B._build(
        "logmel_cached", batch, n_rows, compute_dtype="bfloat16",
        scan=True)
    cps, st = B._time_epoch_scan(st, ep, feats, labels, batch, n_rows,
                                 warmup=2, iters=6)
    flush("escan_b256_bf16_cps", round(cps, 1))
    flush("ms_per_step", round(batch / cps * 1000, 3))
    flush("ceiling", B._leg_ceiling(cps, "logmel_cached", 256,
                                    compute_dtype="bfloat16"))

    # per-op trace (r4f methodology): 3 epochs x 8 steps
    S = 8
    key = jax.random.PRNGKey(0)
    mats = [jnp.asarray(
        (np.arange(S * batch).reshape(S, batch) + e) % n_rows,
        jnp.int32) for e in range(3)]
    valid = jnp.ones((S, batch), jnp.float32)
    tdir = "/tmp/r5d_trace"
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
            if us / 1e3 / n_steps >= 0.02]
    flush("all_ops_ms_per_step", rows[:70])

    # XLA's own post-fusion HBM traffic for the compiled epoch step —
    # the ACTUAL bytes side of the roofline (the analytic model is a
    # floor; this is what the program really moves)
    from multimodal_emotion_detection_tpu.utils.flops import (
        compiled_bytes_accessed,
    )

    try:
        ba = compiled_bytes_accessed(
            ep.lower(st, feats, labels, mats[0], valid, key))
    except Exception as exc:  # lower() unsupported on some backends
        ba = None
        flush("bytes_accessed_error", repr(exc))
    if ba is not None:
        bw = 662e9  # measured triad (benchmarks/r5_bw_probe.json)
        # scan bodies count ONCE in cost analysis (r5_bytes_probe.json):
        # ba ~= one step's traffic, and an UPPER bound at that
        flush("xla_bytes_accessed_per_step_upper", round(ba))
        flush("bw_ms_per_step_upper", round(ba / bw * 1e3, 4))

    flush("kernel_route_note",
          "recurrent.py gates the Pallas training kernels; see rows above"
          " — fusion/while names = XLA scan, custom-call = Pallas")

    # A/B: same leg at f32 (is bf16 itself the regression?)
    st2, ep2, feats2, labels2 = B._build(
        "logmel_cached", batch, n_rows, compute_dtype="float32",
        scan=True)
    cps_f32, _ = B._time_epoch_scan(st2, ep2, feats2, labels2, batch,
                                    n_rows, warmup=2, iters=6)
    flush("escan_b256_f32_cps", round(cps_f32, 1))

    # A/B: b128 bf16 (does the anti-scaling start at 128 or 256?)
    st3, ep3, feats3, labels3 = B._build(
        "logmel_cached", 128, n_rows, compute_dtype="bfloat16",
        scan=True)
    cps_b128, _ = B._time_epoch_scan(st3, ep3, feats3, labels3, 128,
                                     n_rows, warmup=2, iters=6)
    flush("escan_b128_bf16_cps", round(cps_b128, 1))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
