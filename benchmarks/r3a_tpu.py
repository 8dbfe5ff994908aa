"""r3a: where does the flagship step's time go? (roofline follow-up)

bench.py now says the 20.8k-clips/s step runs at ~21% MFU.  This probe
decomposes the step to name the sinks: full step vs fwd-only vs fwd+bwd,
audio LSTM vs video encoder vs head, per-step vs epoch-scan dispatch, at
b32 fp32 and b256 bf16.  Last (failure-isolated): a jax.profiler trace of
the flagship step for op-level attribution.

All timings are min-of-reps within one process, fetch-synced (axon
block_until_ready caveat, see bench.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3a_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {value}", flush=True)


def watchdog(seconds=3000):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def chained_ms(apply_fn, variables, x, K=50, reps=3):
    """Per-call device time via K data-dependent iterations inside ONE jit
    (single dispatch + single fetch).  Per-rep host syncing over the
    tunneled backend costs ~22 ms RTT — an order of magnitude above the
    ops being measured — so naive per-call timing is meaningless here."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v, x0):
        def body(c, _):
            y = apply_fn(v, c)
            leaf = jax.tree_util.tree_leaves(y)[0]
            c2 = c * (1.0 + 1e-30 * jnp.sum(leaf).astype(jnp.float32)).astype(c.dtype)
            return c2, ()

        out, _ = jax.lax.scan(body, x0, None, length=K)
        return jnp.sum(out)

    float(np.asarray(run(variables, x)))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        v = float(np.asarray(run(variables, x)))
        best = min(best, time.perf_counter() - t0)
    assert v == v
    return best / K * 1e3


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    watchdog()
    flush("platform", jax.default_backend())

    # ---- encoder-level decomposition (flagship geometry) ----
    from multimodal_emotion_detection_tpu.models.encoders import (
        FrameEncoder,
        SequenceEncoder,
    )

    for batch in (32, 256):
        dt = jnp.float32 if batch == 32 else jnp.bfloat16
        tag = f"b{batch}" + ("_bf16" if batch == 256 else "")
        rng = np.random.RandomState(0)
        xa = jnp.asarray(rng.randn(batch, 372, 64), dt)
        xv = jnp.asarray(rng.rand(batch, 24, 4096), dt)

        # inference_kernel=False: the eval-only Pallas recurrence kernel
        # has no differentiation rule; the train path (what we decompose)
        # runs the custom-VJP fused scan
        enc_a = SequenceEncoder(input_dim=64, hidden_dim=256, output_dim=128,
                                num_layers=2, encoder_type="lstm", dtype=dt,
                                inference_kernel=False)
        va = jax.jit(lambda k: enc_a.init(k, xa))(jax.random.PRNGKey(0))
        fwd_a = lambda v, x: enc_a.apply(v, x, deterministic=True)
        flush(f"audio_fwd_{tag}_ms", chained_ms(fwd_a, va, xa))
        grad_a = jax.grad(lambda v, x: jnp.sum(fwd_a(v, x)), argnums=1)
        flush(f"audio_fwdbwd_{tag}_ms", chained_ms(grad_a, va, xa))

        enc_v = FrameEncoder(frame_dim=4096, hidden_dim=256, output_dim=128,
                             dtype=dt)
        vv = jax.jit(lambda k: enc_v.init(k, xv))(jax.random.PRNGKey(0))
        fwd_v = lambda v, x: enc_v.apply(v, x, deterministic=True)
        flush(f"video_fwd_{tag}_ms", chained_ms(fwd_v, vv, xv))
        grad_v = jax.grad(lambda v, x: jnp.sum(fwd_v(v, x)), argnums=1)
        flush(f"video_fwdbwd_{tag}_ms", chained_ms(grad_v, vv, xv))

    # ---- full-step timings (bench.py timers: state rebinding handles the
    # donated-state contract; async dispatch amortizes the tunnel RTT) ----
    for batch, dtype, tag in ((32, "float32", "b32"),
                              (256, "bfloat16", "b256_bf16")):
        if tag == "b256_bf16":
            jax.config.update("jax_default_prng_impl", "rbg")
        state, step, feats, labels = B._build(
            "logmel_cached", batch, 256, compute_dtype=dtype, scan=False)
        cps, _ = B._time_steps(state, step, feats, labels, batch, 256,
                               warmup=3, iters=30)
        flush(f"train_step_{tag}_clips_per_sec", cps)
        flush(f"train_step_{tag}_ms", batch / cps * 1e3)

        state_s, estep, feats_s, labels_s = B._build(
            "logmel_cached", batch, 256, compute_dtype=dtype, scan=True)
        cps, _ = B._time_epoch_scan(state_s, estep, feats_s, labels_s,
                                    batch, 256, warmup=2, iters=8)
        flush(f"epoch8_{tag}_clips_per_sec", cps)
        flush(f"epoch8_{tag}_ms_per_step", batch / cps * 1e3)
        if tag == "b256_bf16":
            jax.config.update("jax_default_prng_impl", "threefry2x32")

    # ---- profiler trace (LAST: failure-isolated) ----
    try:
        state, step, feats, labels = B._build(
            "logmel_cached", 32, 256, compute_dtype="float32", scan=False)
        key = jax.random.PRNGKey(0)
        valid = jnp.ones((32,), jnp.float32)
        idxs = [jnp.asarray((np.arange(32) + i * 32) % 256, jnp.int32)
                for i in range(13)]
        for i in range(3):
            state, m = step(state, feats, labels, idxs[i], valid, key)
        float(m["loss"])
        jax.profiler.start_trace("/tmp/r3a_trace")
        for i in range(3, 13):
            state, m = step(state, feats, labels, idxs[i], valid, key)
        float(m["loss"])
        jax.profiler.stop_trace()
        flush("trace", "/tmp/r3a_trace")
        print("TRACE OK", flush=True)
    except Exception as e:  # noqa: BLE001
        flush("trace_error", repr(e))
        print("TRACE FAILED:", e, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
