"""r3c: residual-native (v2) kernel pair — on-chip validation + full-step A/B.

1. directional-derivative self-consistency of the v2 production path
   (fwd residual kernel + fused packed-reverse chain) at the flagship
   geometry — the r2u6 probe-B methodology (chip value-vs-scan comparisons
   are chaos-dominated at T=372; interpret-mode exact parity is already CI,
   tests/test_ops.py::test_lstm_residual_native_v2_path_matches_scan);
2. interleaved full-train-step A/B at b32 f32: res2 auto vs off (legacy
   slice/shift residual path), 2 rounds each;
3. the same A/B under the epoch-scan driver (the headline configuration).

Writes benchmarks/r3c_tpu.json incrementally.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench as B  # noqa: E402

OUT = Path(__file__).parent / "r3c_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
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

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    watchdog()
    flush("platform", jax.default_backend())

    # ---- 1: directional derivative of the v2 production path ----
    b, d, h, t = 32, 64, 256, 372
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[2 + 2 * i],
                                         (d if i == 0 else h, 4 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
         "b": jnp.full((4 * h,), 0.02)}
        for i in range(2)
    )
    x_bm = jax.random.normal(ks[0], (b, t, d))
    keep_bm = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.2).astype(
        jnp.float32)

    assert lv._res2_ok(jnp.swapaxes(x_bm, 0, 1), params, False), \
        "v2 gate must engage at the flagship geometry"

    def loss(x):
        hf = lv.fused_lstm_final(x, keep_bm, params)
        return jnp.sum(hf * jnp.sin(hf)) / (b * h)

    loss_j = jax.jit(loss)
    grad_j = jax.jit(jax.grad(loss))
    v = jax.random.normal(ks[6], x_bm.shape)
    v = v / jnp.linalg.norm(v)
    directional = float(jnp.vdot(grad_j(x_bm), v))
    eps = 1e-2
    fd = float((loss_j(x_bm + eps * v) - loss_j(x_bm - eps * v)) / (2 * eps))
    flush("v2_directional", {
        "fd": fd, "grad_dot_v": directional,
        "rel": abs(fd - directional) / max(abs(fd), 1e-9),
    })

    # weight-grad magnitude sanity vs the legacy kernel path (chaos bounds
    # value equality; magnitudes must agree to ~1e-2 rel at T=372)
    gw_v2 = jax.jit(jax.grad(lambda p: jnp.sum(
        lv.fused_lstm_final(x_bm, keep_bm, p) ** 2)))(params)
    lv.set_res2_mode("off")
    gw_legacy = jax.jit(jax.grad(lambda p: jnp.sum(
        lv.fused_lstm_final(x_bm, keep_bm, p) ** 2)))(params)
    lv.set_res2_mode("auto")
    rels = {}
    for layer in range(2):
        for k in ("w_ih", "w_hh", "b"):
            a = np.asarray(gw_legacy[layer][k])
            bb = np.asarray(gw_v2[layer][k])
            rels[f"l{layer}_{k}"] = float(
                np.abs(a - bb).max() / max(np.abs(a).max(), 1e-9))
    flush("v2_vs_legacy_weightgrad_rel", rels)

    # ---- 2+3: interleaved full-step A/B ----
    def build(scan):
        return B._build("logmel_cached", 32, 256, compute_dtype="float32",
                        scan=scan)

    def time_steps(built):
        state, step, feats, labels = built
        cps, _ = B._time_steps(state, step, feats, labels, 32, 256,
                               warmup=3, iters=30)
        return cps

    def time_escan(built):
        state, estep, feats, labels = built
        cps, _ = B._time_epoch_scan(state, estep, feats, labels, 32, 256,
                                    warmup=2, iters=8)
        return cps

    for rnd in (1, 2):
        for mode in ("auto", "off"):
            lv.set_res2_mode(mode)
            flush(f"step_b32_res2_{mode}_r{rnd}_cps",
                  round(time_steps(build(False)), 1))
        for mode in ("auto", "off"):
            lv.set_res2_mode(mode)
            flush(f"escan_b32_res2_{mode}_r{rnd}_cps",
                  round(time_escan(build(True)), 1))
    lv.set_res2_mode("auto")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
