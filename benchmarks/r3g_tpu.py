"""r3g: bf16 residual streams (runtime.lstm_residual_dtype) on chip.

r3f showed both v2 recurrence kernels are HBM-bandwidth-bound on the
residual streams (fwd ~220 MB, bwd ~230 MB per b32 step at T=372 H=256 —
~0.47 ms of the 0.94 ms device step).  bf16 streams halve that traffic.
This probe measures the full production epoch-scan step:

  legs (interleaved, 2 rounds):
    f32res_threefry   — current headline config
    bf16res_threefry  — the new lever alone
    bf16res_rbg       — stacked with the r3f rbg win (+4-7%)

plus isolated audio-encoder fwd+bwd (f32 vs bf16 residuals) and an
ON-CHIP gradient envelope at the flagship geometry (B32 T372 H256):
max rel delta per weight-gradient leaf, bf16-res vs f32-res, both on the
v2 kernel path.  Writes r3g_tpu.json incrementally.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from benchmarks.r3a_tpu import chained_ms  # noqa: E402
from benchmarks.r3f_tpu import build_flagship  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3g_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {json.dumps(value)[:200]}", flush=True)


def watchdog(seconds=3300):
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
    # merge any banked results BEFORE the first flush (a flush overwrites
    # the file from RESULTS)
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())
    if "--envelope-only" in sys.argv:
        envelope_leg(jax, jnp, lv)
        print("DONE", flush=True)
        return

    # ---- build one epoch-scan program per leg (trace-time dtype) ----
    lv.set_res2_dtype("float32")
    st_a, ep_a, feats, labels, *_ = build_flagship()
    # warm under f32
    cps, st_a = B._time_epoch_scan(st_a, ep_a, feats, labels, 32, 256,
                                   warmup=2, iters=2)

    lv.set_res2_dtype("bfloat16")
    st_b, ep_b, feats_b, labels_b, *_ = build_flagship()
    cps, st_b = B._time_epoch_scan(st_b, ep_b, feats_b, labels_b, 32, 256,
                                   warmup=2, iters=2)
    lv.set_res2_dtype("float32")

    def time_leg(state, estep, f, l, dtype, prng=None):
        lv.set_res2_dtype(dtype)
        if prng is not None:
            jax.config.update("jax_default_prng_impl", prng)
        try:
            return B._time_epoch_scan(state, estep, f, l, 32, 256,
                                      warmup=1, iters=8)
        finally:
            lv.set_res2_dtype("float32")
            if prng is not None:
                jax.config.update("jax_default_prng_impl", "threefry2x32")

    for rnd in (1, 2):
        cps, st_a = time_leg(st_a, ep_a, feats, labels, "float32")
        flush(f"escan_b32_f32res_threefry_r{rnd}_cps", round(cps, 1))
        cps, st_b = time_leg(st_b, ep_b, feats_b, labels_b, "bfloat16")
        flush(f"escan_b32_bf16res_threefry_r{rnd}_cps", round(cps, 1))
        cps, st_b = time_leg(st_b, ep_b, feats_b, labels_b, "bfloat16",
                             prng="rbg")
        flush(f"escan_b32_bf16res_rbg_r{rnd}_cps", round(cps, 1))

    # ---- isolated audio encoder fwd+bwd, f32 vs bf16 residuals ----
    from multimodal_emotion_detection_tpu.models.encoders import (
        SequenceEncoder,
    )

    rng = np.random.RandomState(0)
    xa = jnp.asarray(rng.randn(32, 372, 64), jnp.float32)
    enc_a = SequenceEncoder(input_dim=64, hidden_dim=256, output_dim=128,
                            num_layers=2, encoder_type="lstm",
                            inference_kernel=False)
    va = jax.jit(lambda k: enc_a.init(k, xa))(jax.random.PRNGKey(0))
    grad_a = jax.grad(
        lambda v, x: jnp.sum(enc_a.apply(v, x, deterministic=True)),
        argnums=1)
    for dtype in ("float32", "bfloat16"):
        lv.set_res2_dtype(dtype)
        try:
            flush(f"audio_fwdbwd_b32_{dtype}res_ms",
                  round(chained_ms(grad_a, va, xa), 4))
        finally:
            lv.set_res2_dtype("float32")

    envelope_leg(jax, jnp, lv)
    print("DONE", flush=True)


def envelope_leg(jax, jnp, lv):
    import numpy as np

    # ---- on-chip gradient envelope at the flagship geometry ----
    b, t, d, h = 32, 372, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    x = jax.random.normal(ks[0], (b, t, d))
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.1).astype(jnp.float32)
    params = tuple(
        {
            "w_ih": 0.3 * jax.random.normal(
                ks[2 + 3 * layer], (d if layer == 0 else h, 4 * h)),
            "w_hh": 0.3 * jax.random.normal(ks[3 + 3 * layer], (h, 4 * h)),
            "b": 0.1 * jax.random.normal(ks[4 + 3 * layer], (4 * h,)),
        }
        for layer in range(2)
    )

    def run_grad(dtype):
        # fresh function object per leg — jax.jit shares its trace cache
        # across wrappers of the same fun, so one shared loss fn would
        # NOT retrace under the flipped global (first version of this
        # probe measured an all-zero envelope exactly because of that)
        def loss_final(x, keep, params):
            hf = lv.fused_lstm_final(x, keep, params)
            return jnp.sum(hf * jnp.sin(hf))

        lv.set_res2_dtype(dtype)
        try:
            v, g = jax.jit(
                jax.value_and_grad(loss_final, argnums=(2,))
            )(x, keep, params)
            return float(v), g
        finally:
            lv.set_res2_dtype("float32")

    v32, g32 = run_grad("float32")
    v16, g16 = run_grad("bfloat16")
    env = {}
    for layer in range(2):
        for k in ("w_ih", "w_hh", "b"):
            a = np.asarray(g32[0][layer][k])
            c = np.asarray(g16[0][layer][k])
            env[f"l{layer}_{k}"] = round(
                float(np.max(np.abs(a - c)) / max(1e-6, np.max(np.abs(a)))),
                6)
    flush("chip_grad_envelope_maxrel", env)
    flush("chip_value_delta", abs(v16 - v32) / max(1e-6, abs(v32)))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
