"""r3t: gate-rematerializing LSTM kernel pair (v3) on chip.

The v2 pair is HBM-bandwidth-bound on its residual streams (r3f trace:
~0.47 ms of the 0.94 ms device step) while the MXU idles between the
small serial matmuls.  v3 stores only [c0p|c1p] (+ the h_prev/x series
the weight-gradient contractions need anyway) and recomputes the gate
pre-activations in the reverse kernel — kernel-pair traffic drops ~45%
at f32 (fwd writes 13H -> 5H per step) for three extra small dots per
reverse step.

Legs (each escan program BUILT under its own trace-time knobs, then the
timing interleaved across rounds in one process):

  f32res_v2 / f32res_v3      — reference-parity config lever
  bf16res_v2 / bf16res_v3    — fast.yaml regime (streams already halved)

plus isolated audio-encoder fwd+bwd ms per leg and an ON-CHIP gradient
parity check v3-vs-v2 at the flagship geometry (expect matmul-rounding
scale at f32).  Writes r3t_tpu.json incrementally.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from benchmarks.r3a_tpu import chained_ms  # noqa: E402
from benchmarks.r3f_tpu import build_flagship  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3t_tpu.json")
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
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())

    # ---- build one epoch-scan program per leg under its knobs ----
    legs = {}
    for name, dtype, remat in (
        ("f32res_v2", "float32", "off"),
        ("f32res_v3", "float32", "on"),
        ("bf16res_v2", "bfloat16", "off"),
        ("bf16res_v3", "bfloat16", "on"),
    ):
        lv.set_res2_dtype(dtype)
        lv.set_res2_remat(remat)
        try:
            st, ep, feats, labels, *_ = build_flagship()
            _, st = B._time_epoch_scan(st, ep, feats, labels, 32, 256,
                                       warmup=2, iters=2)
        finally:
            lv.set_res2_dtype("float32")
            lv.set_res2_remat("off")
        legs[name] = (st, ep, feats, labels)

    for rnd in (1, 2):
        for name in legs:
            st, ep, feats, labels = legs[name]
            cps, st = B._time_epoch_scan(st, ep, feats, labels, 32, 256,
                                         warmup=1, iters=8)
            legs[name] = (st, ep, feats, labels)
            flush(f"escan_b32_{name}_r{rnd}_cps", round(cps, 1))

    # ---- isolated audio encoder fwd+bwd ----
    from multimodal_emotion_detection_tpu.models.encoders import (
        SequenceEncoder,
    )

    rng = np.random.RandomState(0)
    xa = jnp.asarray(rng.randn(32, 372, 64), jnp.float32)
    enc_a = SequenceEncoder(input_dim=64, hidden_dim=256, output_dim=128,
                            num_layers=2, encoder_type="lstm",
                            inference_kernel=False)
    va = jax.jit(lambda k: enc_a.init(k, xa))(jax.random.PRNGKey(0))
    for dtype in ("float32", "bfloat16"):
        for remat in ("off", "on"):
            lv.set_res2_dtype(dtype)
            lv.set_res2_remat(remat)
            try:
                # fresh fn object per leg (trace-cache gotcha, r3g note)
                def grad_a(v, x):
                    return jax.grad(
                        lambda vv, xx: jnp.sum(
                            enc_a.apply(vv, xx, deterministic=True)),
                        argnums=1)(v, x)

                flush(f"audio_fwdbwd_b32_{dtype}res_remat_{remat}_ms",
                      round(chained_ms(grad_a, va, xa), 4))
            finally:
                lv.set_res2_dtype("float32")
                lv.set_res2_remat("off")

    parity_leg(jax, jnp, lv)
    print("DONE", flush=True)


def parity_leg(jax, jnp, lv):
    """v3-vs-v2 gradient parity on chip at the flagship geometry."""
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

    def run_grad(remat):
        def loss_final(x, keep, params):
            hf = lv.fused_lstm_final(x, keep, params)
            return jnp.sum(hf * jnp.sin(hf))

        lv.set_res2_remat(remat)
        try:
            v, g = jax.jit(
                jax.value_and_grad(loss_final, argnums=(2,))
            )(x, keep, params)
            return float(v), g
        finally:
            lv.set_res2_remat("off")

    v2, g2 = run_grad("off")
    v3, g3 = run_grad("on")
    env = {}
    for layer in range(2):
        for k in ("w_ih", "w_hh", "b"):
            a = np.asarray(g2[0][layer][k])
            c = np.asarray(g3[0][layer][k])
            env[f"l{layer}_{k}"] = round(
                float(np.max(np.abs(a - c)) / max(1e-6, np.max(np.abs(a)))),
                8)
    flush("chip_grad_v3_vs_v2_maxrel", env)
    flush("chip_value_delta", abs(v3 - v2) / max(1e-6, abs(v2)))


if __name__ == "__main__":
    main()
