"""r3l: GRU residual-native (v2) kernel pair on chip — numerics + A/B.

The GRU twin of the round-3 LSTM redesign (r3c): the forward emits
pre-step h series + packed gate activations grouped by consumer, the
fused reverse chain reads them directly (no 5H re-packing — the movement
that made r2p's fused GRU backward SLOWER than layered), dgates come out
as dih + the dhn lane only (shared-lane trick), pads are zeroed and the
weight-gradient contractions run over t_pad unsliced.  Also adds
``fused_gru_final`` (dys-free backward) and bf16 residual streams on the
final-hidden path.

Numerics (flagship-ish geometry b32 T=372 h256):
  1. v2 forward finals vs legacy kernel forward: bitwise (identical
     per-step math and order)
  2. v2 gradients vs the legacy kernel path: rel per leaf (different
     matmul order -> chaos-envelope scale at worst; report)
  3. directional-derivative check of the v2 path against its own forward
     (gradient-aligned direction, like scripts/chip_numerics_gate.py)
Perf (interleaved min-of-3):
  4. isolated fused_gru_final fwd+bwd: v2 f32 / v2 bf16-res / legacy
  5. full GRU-encoder train step (epoch-scan driver): same three legs
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r3l_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:220]}", flush=True)


def watchdog(seconds=3300):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    flush("platform", jax.default_backend())

    b, t, d, h = 32, 372, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.1).astype(
        jnp.float32) / 0.9
    params = tuple(
        {
            "w_ih": 0.3 * jax.random.normal(
                ks[2 + 4 * l], (d if l == 0 else h, 3 * h), jnp.float32),
            "w_hh": 0.3 * jax.random.normal(ks[3 + 4 * l], (h, 3 * h),
                                            jnp.float32),
            "b_ih": 0.1 * jax.random.normal(ks[4 + 4 * l], (3 * h,),
                                            jnp.float32),
            "b_hh": 0.1 * jax.random.normal(ks[5 + 4 * l], (3 * h,),
                                            jnp.float32),
        }
        for l in range(2)
    )
    x_tm = jnp.swapaxes(x, 0, 1)
    assert lv._gru_res2_ok(x_tm, params, interpret=False), "v2 gate closed"

    # fresh loss per leg (jit trace-cache is shared across wrappers)
    def make_loss():
        def loss(x, keep, params):
            hf = lv.fused_gru_final(x, keep, params)
            return jnp.sum(hf * jnp.sin(hf))

        return loss

    def run_leg(res2_mode, res_dtype="float32"):
        prev_m = lv.set_res2_mode(res2_mode)
        prev_d = lv.set_res2_dtype(res_dtype)
        try:
            g = jax.jit(jax.value_and_grad(make_loss(), argnums=(0, 2)))
            v, grads = g(x, keep, params)
            v = float(v)  # sync
            return v, grads, g
        finally:
            lv.set_res2_mode(prev_m)
            lv.set_res2_dtype(prev_d)

    # ---- 1+2: v2 vs legacy kernel path ----
    v_v2, g_v2, fn_v2 = run_leg("auto")
    v_leg, g_leg, fn_leg = run_leg("off")
    rels = {}
    flat_v2 = jax.tree_util.tree_leaves(g_v2)
    flat_leg = jax.tree_util.tree_leaves(g_leg)
    for i, (a, b_) in enumerate(zip(flat_leg, flat_v2)):
        a, b_ = np.asarray(a), np.asarray(b_)
        denom = max(1e-9, float(np.abs(a).max()))
        rels[f"leaf{i}"] = round(float(np.abs(a - b_).max()) / denom, 8)
    flush("value_delta_v2_vs_legacy", abs(v_v2 - v_leg))
    flush("grad_rel_v2_vs_legacy", rels)

    # ---- 3: gradient-aligned directional derivative (v2's own fwd) ----
    def flat_dot(ga, gb):
        # host f64 accumulation: the on-device f32 sum overflowed on the
        # first banked run (analytic=inf -> eps=0 -> fd NaN)
        return sum(
            float(np.asarray(a, np.float64).ravel()
                  @ np.asarray(b, np.float64).ravel())
            for a, b in zip(jax.tree_util.tree_leaves(ga),
                            jax.tree_util.tree_leaves(gb))
        )

    # At T=372 with the 0.3-scale random recurrence (per-block spectral
    # norm ~10) the map chain-explodes — |g|^2 overflows f32 and any FD
    # along +g saturates immediately, so no finite difference is
    # meaningful there; the 6e-7 grad parity vs the legacy kernel IS the
    # T=372 check.  The FD leg runs at T=48 with the torch-default
    # 1/sqrt(h) init (well-conditioned), validating the on-chip LOWERING
    # of the same kernel pair (tile/pad/DMA paths identical; only
    # num_chunks varies).  Alongside it: v2 grads vs the pure-XLA scan
    # backward at the same geometry — an independent implementation.
    td = 48
    scale = 1.0 / np.sqrt(h)
    params_t = tuple(
        {k: (v * (scale / 0.3) if k.startswith("w") else v)
         for k, v in p.items()}
        for p in params
    )
    xs = jax.random.normal(ks[8], (b, td, d), jnp.float32)
    keeps = (jax.random.uniform(ks[9], (b, td, 1, h)) > 0.1).astype(
        jnp.float32) / 0.9

    def grads_at(mode):
        prev_m = lv.set_res2_mode("auto")
        prev_f = lv.set_fwd_kernel_mode(mode)
        prev_b = lv.set_bwd_kernel_mode(mode)
        try:
            g = jax.jit(jax.value_and_grad(make_loss(), argnums=(0, 2)))
            v, gr = g(xs, keeps, params_t)
            return float(v), gr
        finally:
            lv.set_res2_mode(prev_m)
            lv.set_fwd_kernel_mode(prev_f)
            lv.set_bwd_kernel_mode(prev_b)

    v_base, gs = grads_at("auto")       # v2 kernels on chip
    v_scan, gs_scan = grads_at("off")   # pure-XLA scan backward
    rels48 = []
    for a, b_ in zip(jax.tree_util.tree_leaves(gs_scan),
                     jax.tree_util.tree_leaves(gs)):
        a, b_ = np.asarray(a), np.asarray(b_)
        denom = max(1e-9, float(np.abs(a).max()))
        rels48.append(round(float(np.abs(a - b_).max()) / denom, 8))
    flush("grad_rel_v2_vs_scan_T48", {
        "max": max(rels48), "value_delta": abs(v_base - v_scan)})

    prev_m = lv.set_res2_mode("auto")
    try:
        lossf = jax.jit(make_loss())
        analytic = flat_dot(gs, gs)
        gnorm = float(np.sqrt(analytic))
        eps = 3e-3 / gnorm
        x2 = xs + jnp.float32(eps) * gs[0]
        p2 = tuple(
            {k: p[k] + jnp.float32(eps) * g[k] for k in p}
            for p, g in zip(params_t, gs[1])
        )
        v_plus = float(lossf(x2, keeps, p2))
        fd = (v_plus - v_base) / eps
        flush("directional_check_T48", {
            "fd": fd, "analytic": analytic, "v_base": v_base,
            "rel": round(abs(fd - analytic) / max(abs(analytic), 1e-9), 6),
        })
    finally:
        lv.set_res2_mode(prev_m)

    # ---- 4: isolated fwd+bwd timing, interleaved ----
    def make_timed(res2_mode, res_dtype):
        prev_m = lv.set_res2_mode(res2_mode)
        prev_d = lv.set_res2_dtype(res_dtype)
        try:
            g = jax.jit(jax.value_and_grad(make_loss(), argnums=(0, 2)))
            float(g(x, keep, params)[0])  # compile + sync
            return g
        finally:
            lv.set_res2_mode(prev_m)
            lv.set_res2_dtype(prev_d)

    legs = {
        "v2_f32": make_timed("auto", "float32"),
        "v2_bf16res": make_timed("auto", "bfloat16"),
        "legacy": make_timed("off", "float32"),
    }
    best = {k: float("inf") for k in legs}
    for _ in range(3):
        for name, g in legs.items():
            t0 = time.perf_counter()
            for _ in range(20):
                out = g(x, keep, params)
            float(out[0])
            best[name] = min(best[name], (time.perf_counter() - t0) / 20)
    flush("isolated_ms", {k: round(v * 1e3, 4) for k, v in best.items()})
    flush("isolated_speedup_v2_vs_legacy",
          round(best["legacy"] / best["v2_f32"], 4))
    flush("isolated_speedup_bf16_vs_legacy",
          round(best["legacy"] / best["v2_bf16res"], 4))

    # ---- 5: full GRU-encoder train step (epoch-scan driver) ----
    from multimodal_emotion_detection_tpu.config import (
        Config,
        apply_overrides,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import (
        log_mel_spectrogram,
    )
    from multimodal_emotion_detection_tpu.training.optim import (
        build_optimizer,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_epoch_train_step,
    )
    from bench import _time_epoch_scan

    Bb, N = 32, 256
    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    def step_cps(res2_mode, res_dtype):
        prev_m = lv.set_res2_mode(res2_mode)
        prev_d = lv.set_res2_dtype(res_dtype)
        try:
            cfg = Config()
            apply_overrides(cfg, [
                f"dataset.batch_size={Bb}",
                "model.encoders.audio.hidden_dim=256",
                "model.encoders.audio.encoder_type=gru",
                "model.encoders.video.input_dim=4096",
            ])
            cfg.model.frontend.audio = "logmel"
            cfg.model.frontend.cache = True
            model = classifier_from_config(cfg)
            lp = logmel_params_from_config(cfg.model.frontend)
            feats = {"audio": jax.jit(
                lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
            )(audio_raw), "video": video}
            tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
            sample = {m: a[:Bb] for m, a in feats.items()}
            state = create_train_state(
                model, tx, sample, jnp.ones((Bb, 2), jnp.float32),
                jax.random.PRNGKey(0))
            step = make_epoch_train_step(
                model, tx, num_modalities=2, modality_dropout=0.1,
                has_batch_stats=bool(state.model_state))
            cps, _ = _time_epoch_scan(state, step, feats, labels, Bb, N,
                                      warmup=2, iters=10)
            return round(cps, 1)
        finally:
            lv.set_res2_mode(prev_m)
            lv.set_res2_dtype(prev_d)

    step_legs = {}
    for rnd in range(2):
        for name, args in (("v2_f32", ("auto", "float32")),
                           ("v2_bf16res", ("auto", "bfloat16")),
                           ("legacy", ("off", "float32"))):
            cps = step_cps(*args)
            step_legs[name] = max(step_legs.get(name, 0.0), cps)
        flush(f"step_round{rnd}", step_legs)
    flush("gru_step_ab", {
        **step_legs,
        "v2_vs_legacy": round(step_legs["v2_f32"] / step_legs["legacy"], 4),
        "bf16_vs_legacy": round(
            step_legs["v2_bf16res"] / step_legs["legacy"], 4),
    })


if __name__ == "__main__":
    main()
