"""r5f: big-config per-layer kernels with bf16 residual streams (item 3).

r4b's decomposition left the big config (LSTM x3 h512, the reference
sweep geometry) at mfu 0.3578 = 77% of its occupancy ceiling, naming
residual-stream traffic as the sink.  The arithmetic agrees: at h512/b32
the per-layer forward kernel moves ~655 KB/step (ih in + g/hp/cp out)
= 0.99 us at the measured 662 GB/s, against 0.68 us of f32 MXU work —
the kernel is DMA-bound.  Storing the backward-only streams (g, c_prev)
in bf16 cuts fwd stores 42% and bwd reads 45% while h_prev stays f32
(forward numerics exact; the r3g envelope covers the gradients).

This probe A/Bs the exact bench big leg (b32 f32 compute, epoch-scan)
in ONE process: f32 residuals vs bf16 residuals vs bf16+rbg (the
big-fast candidate).  Banks loss trajectories for the numerics check.

Writes r5f_big_bf16res.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5f_big_bf16res.json")
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


def one_epoch_loss(st, ep, feats, labels, batch, n_rows):
    import jax
    import jax.numpy as jnp

    S = 8
    key = jax.random.PRNGKey(0)
    mat = jnp.asarray(
        (np.arange(S * batch).reshape(S, batch)) % n_rows, jnp.int32)
    valid = jnp.ones((S, batch), jnp.float32)
    st2, m = ep(st, feats, labels, mat, valid, key)
    return float(m["loss"][-1])


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    watchdog()
    flush("platform", jax.default_backend())
    batch, n_rows = 32, 256

    # --- leg A: f32 residuals (current bench big leg) ---
    st, ep, feats, labels = B._build("logmel_cached", batch, n_rows,
                                     scan=True, big=True)
    flush("loss_epoch1_f32", one_epoch_loss(st, ep, feats, labels,
                                            batch, n_rows))
    cps_f32, _ = B._time_epoch_scan(st, ep, feats, labels, batch, n_rows,
                                    warmup=2, iters=10)
    flush("big_b32_f32res_cps", round(cps_f32, 1))

    # --- leg B: bf16 residual streams (g/c_prev only; fwd exact) ---
    prev = lv.set_res2_dtype("bfloat16")
    try:
        st2, ep2, feats2, labels2 = B._build("logmel_cached", batch, n_rows,
                                             scan=True, big=True)
        flush("loss_epoch1_bf16res", one_epoch_loss(
            st2, ep2, feats2, labels2, batch, n_rows))
        cps_bf16, _ = B._time_epoch_scan(st2, ep2, feats2, labels2, batch,
                                         n_rows, warmup=2, iters=10)
    finally:
        lv.set_res2_dtype(prev)
    flush("big_b32_bf16res_cps", round(cps_bf16, 1))
    flush("bf16res_speedup", round(cps_bf16 / cps_f32, 4))

    # --- leg C: bf16 residuals + rbg PRNG (big-fast candidate) ---
    jax.config.update("jax_default_prng_impl", "rbg")
    prev = lv.set_res2_dtype("bfloat16")
    try:
        st3, ep3, feats3, labels3 = B._build("logmel_cached", batch, n_rows,
                                             scan=True, big=True)
        cps_fast, _ = B._time_epoch_scan(st3, ep3, feats3, labels3, batch,
                                         n_rows, warmup=2, iters=10)
    finally:
        lv.set_res2_dtype(prev)
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    flush("big_b32_fast_cps", round(cps_fast, 1))

    # ceilings + achieved MFU for the record
    flush("ceiling_f32", B._leg_ceiling(cps_f32, "logmel_cached", batch,
                                        big=True))
    flush("ceiling_bf16res", B._leg_ceiling(cps_bf16, "logmel_cached",
                                            batch, big=True, res_bytes=2))
    f = B._train_flops_per_clip("logmel_cached", batch, big=True)
    flush("mfu_f32", round(B.mfu_of(cps_f32, f), 4))
    flush("mfu_bf16res", round(B.mfu_of(cps_bf16, f), 4))
    flush("mfu_fast", round(B.mfu_of(cps_fast, f), 4))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
