"""r5e: close the transformer adjudication with ACTUAL bytes (item 1).

r4f showed the transformer's 41%-of-attainable gap is diffuse (dozens of
0.08-0.19 ms bandwidth-bound fusions, no sink >8.5%) but never bounded
it: the analytic bytes model is a FLOOR (params + residuals once), while
the real program re-reads activations across fusion boundaries.  This
probe takes XLA's own post-fusion cost analysis ('bytes accessed') of
the compiled epoch step — the actual traffic — and compares

    t_bw_actual = bytes_accessed / 662 GB/s (measured triad)

against the measured step time.  If t_bw_actual ~= t_step, the leg is
PROVEN memory-bound at its real traffic and the ceiling argument is
closed; the remaining lever is then traffic reduction (fusion), which
the banked number quantifies exactly.

Writes r5e_transformer_bytes.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5e_transformer_bytes.json")
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


BW = 662e9  # measured triad bandwidth (benchmarks/r5_bw_probe.json)


def bytes_and_time(ep, st, feats, labels, batch, n_rows, steps_per_epoch=8):
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.utils.flops import (
        compiled_bytes_accessed,
    )

    S = steps_per_epoch
    key = jax.random.PRNGKey(0)
    mat = jnp.asarray(
        (np.arange(S * batch).reshape(S, batch)) % n_rows, jnp.int32)
    valid = jnp.ones((S, batch), jnp.float32)
    ba = compiled_bytes_accessed(
        ep.lower(st, feats, labels, mat, valid, key))
    cps, _ = B._time_epoch_scan(st, ep, feats, labels, batch, n_rows,
                                warmup=2, iters=8)
    step_ms = batch / cps * 1e3
    out = {"cps": round(cps, 1), "step_ms": round(step_ms, 4)}
    if ba is not None:
        # cost-analysis convention (r5_bytes_probe.json): a scan body is
        # counted ONCE regardless of trip count, so ba ~= the traffic of
        # ONE step (+ one-time operands).  It is an UPPER bound — it
        # books every fusion operand at HBM price even when XLA keeps it
        # in VMEM (the flagship's ba would imply 1.26 TB/s).
        per_step = ba
        out["bytes_per_step_upper"] = round(per_step)
        out["bw_ms_per_step_upper"] = round(per_step / BW * 1e3, 4)
        out["bw_upper_over_step"] = round(
            (per_step / BW * 1e3) / step_ms, 3)
    return out


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    watchdog()
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    batch, n_rows = 32, 256

    # the bench leg: b32 bf16 epoch-scan transformer
    st, ep, feats, labels = B._build(
        "logmel_cached", batch, n_rows, compute_dtype="bfloat16",
        scan=True, encoder="transformer")
    flush("transformer_b32_bf16", bytes_and_time(
        ep, st, feats, labels, batch, n_rows))

    # the flagship LSTM leg under the same lens (sanity anchor: it runs
    # at 85% of attainable, so its bw share should be well below 1)
    st2, ep2, feats2, labels2 = B._build(
        "logmel_cached", batch, n_rows, compute_dtype="float32",
        scan=True)
    flush("lstm_b32_f32", bytes_and_time(
        ep2, st2, feats2, labels2, batch, n_rows))

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
