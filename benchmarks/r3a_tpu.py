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


def timeit(fn, *args, reps=30, inner=1, warmup=3):
    best = float("inf")
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def _sync(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(leaves[-1])  # value fetch


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

        # inference_kernel=False: the eval-only Pallas recurrence kernel has
        # no differentiation rule; the train path (what we are decomposing)
        # runs the custom-VJP fused scan
        enc_a = SequenceEncoder(input_dim=64, hidden_dim=256, output_dim=128,
                                num_layers=2, encoder_type="lstm", dtype=dt,
                                inference_kernel=False)
        va = jax.jit(lambda k: enc_a.init(k, xa))(jax.random.PRNGKey(0))
        f_a = jax.jit(lambda v, x: enc_a.apply(v, x, deterministic=True))
        flush(f"audio_fwd_{tag}_ms", timeit(f_a, va, xa) * 1e3)

        def loss_a(v, x):
            return enc_a.apply(v, x, deterministic=True).sum()

        g_a = jax.jit(jax.grad(loss_a))
        flush(f"audio_fwdbwd_{tag}_ms", timeit(g_a, va, xa) * 1e3)

        enc_v = FrameEncoder(frame_dim=4096, hidden_dim=256, output_dim=128,
                             dtype=dt)
        vv = jax.jit(lambda k: enc_v.init(k, xv))(jax.random.PRNGKey(0))
        f_v = jax.jit(lambda v, x: enc_v.apply(v, x, deterministic=True))
        flush(f"video_fwd_{tag}_ms", timeit(f_v, vv, xv) * 1e3)

        def loss_v(v, x):
            return enc_v.apply(v, x, deterministic=True).sum()

        g_v = jax.jit(jax.grad(loss_v))
        flush(f"video_fwdbwd_{tag}_ms", timeit(g_v, vv, xv) * 1e3)

    # ---- full-step decomposition at b32 (the headline config) ----
    for batch, dtype, tag in ((32, "float32", "b32"),
                              (256, "bfloat16", "b256_bf16")):
        if tag == "b256_bf16":
            jax.config.update("jax_default_prng_impl", "rbg")
        state, step, feats, labels = B._build(
            "logmel_cached", batch, 256, compute_dtype=dtype, scan=False)
        key = jax.random.PRNGKey(0)
        idx = jnp.arange(batch, dtype=jnp.int32)
        valid = jnp.ones((batch,), jnp.float32)

        def full(state):
            s, m = step(state, feats, labels, idx, valid, key)
            return s, m

        t_full = timeit(full, state, reps=30)
        flush(f"train_step_{tag}_ms", t_full * 1e3)
        flush(f"train_step_{tag}_clips_per_sec", batch / t_full)

        # epoch-scan amortization: 8 steps per dispatch
        state_s, estep, feats_s, labels_s = B._build(
            "logmel_cached", batch, 256, compute_dtype=dtype, scan=True)
        S = 8
        mat = jnp.asarray(
            (np.arange(S * batch).reshape(S, batch)) % 256, jnp.int32)
        vmat = jnp.ones((S, batch), jnp.float32)

        def epoch(state):
            return estep(state, feats_s, labels_s, mat, vmat, key)

        t_epoch = timeit(epoch, state_s, reps=10)
        flush(f"epoch8_{tag}_ms_per_step", t_epoch / S * 1e3)
        flush(f"epoch8_{tag}_clips_per_sec", S * batch / t_epoch)
        if tag == "b256_bf16":
            jax.config.update("jax_default_prng_impl", "threefry2x32")

    # ---- profiler trace (LAST: failure-isolated) ----
    try:
        state, step, feats, labels = B._build(
            "logmel_cached", 32, 256, compute_dtype="float32", scan=False)
        key = jax.random.PRNGKey(0)
        idx = jnp.arange(32, dtype=jnp.int32)
        valid = jnp.ones((32,), jnp.float32)
        for _ in range(3):
            state, m = step(state, feats, labels, idx, valid, key)
        float(m["loss"])
        jax.profiler.start_trace("/tmp/r3a_trace")
        for _ in range(10):
            state, m = step(state, feats, labels, idx, valid, key)
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
