"""Round-2 TPU validation + benchmark batch (one client, one run).

Sections (each independently try/except'd, results flushed incrementally
to benchmarks/r2_tpu.json so a late fault can't lose earlier data):

  1. bwd_parity    — fused_lstm gradients: Pallas in-kernel reverse chain
                     vs the XLA reverse scan, ON CHIP, flagship geometry.
  2. trainstep_ab  — flagship train step, bwd kernel off vs auto,
                     interleaved min-of-3x30 (same process, same chip).
  3. flash_bf16    — flash attention in bf16: parity vs fp32 XLA reference
                     + fwd+bwd timings vs the XLA MHA path, two lengths.
  4. headline      — bench.py-style logmel_pallas b32 with round-2 defaults.

Tunnel discipline: run in background, never kill mid-flight, sync by value
fetch only.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def watchdog(seconds=3000):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def section_bwd_parity():
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_lstm,
        set_bwd_kernel_mode,
    )

    b, t, d, h = 32, 375, 64, 256
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, t, d))
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.1).astype(jnp.float32)
    params = tuple(
        {
            "w_ih": 0.2 * jax.random.normal(ks[2 + 3 * l],
                                            (d if l == 0 else h, 4 * h)),
            "w_hh": 0.2 * jax.random.normal(ks[3 + 3 * l], (h, 4 * h)),
            "b": 0.1 * jax.random.normal(ks[4 + 3 * l], (4 * h,)),
        }
        for l in range(2)
    )

    def loss(x, keep, params):
        ys, h_final = fused_lstm(x, keep, params)
        return jnp.sum(ys * jnp.cos(ys)) + 2.0 * jnp.sum(h_final ** 2)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    set_bwd_kernel_mode("off")
    g_scan = jax.jit(grad_fn)(x, keep, params)
    g_scan = jax.tree.map(np.asarray, g_scan)  # value fetch = sync
    set_bwd_kernel_mode("auto")
    g_kern = jax.jit(grad_fn)(x, keep, params)
    g_kern = jax.tree.map(np.asarray, g_kern)
    set_bwd_kernel_mode("auto")

    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_kern)
    max_rel = 0.0
    for a, bb in zip(flat_s, flat_k):
        denom = np.maximum(np.abs(a), 1e-3)
        max_rel = max(max_rel, float(np.max(np.abs(a - bb) / denom)))
    flush("bwd_parity", {"geometry": [b, t, d, h], "max_rel_err": max_rel,
                         "pass": max_rel < 5e-4})


def _build_step(mode: str, batch: int, n_rows: int, frontend="logmel_pallas"):
    import bench

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
    )

    set_bwd_kernel_mode(mode)
    return bench._build(frontend, batch, n_rows)


def section_trainstep_ab():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import bench

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
    )

    batch, n_rows = 32, 256
    variants = {}
    built = {
        mode: _build_step(mode, batch, n_rows) for mode in ("off", "auto")
    }
    # interleaved min-of-3x30 (session-stable timings only within process).
    # The bwd-kernel flag is read at TRACE time, which happens on each
    # variant's FIRST step call — re-assert it before every variant run.
    samples = {"off": [], "auto": []}
    for rep in range(3):
        for mode in ("off", "auto"):
            set_bwd_kernel_mode(mode)
            state, step, features, labels = built[mode]
            # the step donates its state arg: keep the returned state so
            # the next rep doesn't touch donated (deleted) buffers
            cps, state = bench._time_steps(
                state, step, features, labels, batch, n_rows,
                warmup=3 if rep == 0 else 1, iters=30,
            )
            built[mode] = (state, step, features, labels)
            samples[mode].append(cps)
    set_bwd_kernel_mode("auto")
    for mode in ("off", "auto"):
        variants[mode] = max(samples[mode])  # max clips/s == min time
    flush("trainstep_ab", {
        "bwd_scan_clips_per_sec": round(variants["off"], 2),
        "bwd_kernel_clips_per_sec": round(variants["auto"], 2),
        "speedup": round(variants["auto"] / variants["off"], 4),
        "samples": {k: [round(v, 1) for v in vs] for k, vs in samples.items()},
    })


def section_flash_bf16():
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.flash_attention import (
        flash_attention,
    )

    def xla_ref(q, k, v, bias):
        scale = 1.0 / (q.shape[-1] ** 0.5)
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        s = s + bias[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))

    out = {}
    for t_len in (375, 3000):
        b, h, d = 8, 4, 64
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (b, h, t_len, d))
        k = jax.random.normal(ks[1], (b, h, t_len, d))
        v = jax.random.normal(ks[2], (b, h, t_len, d))
        bias = jnp.where(
            jax.random.uniform(ks[3], (b, t_len)) > 0.1, 0.0, -1e9
        ).astype(jnp.float32)

        ref = np.asarray(jax.jit(xla_ref)(q, k, v, bias))

        # ---- bf16 parity (fwd) ----
        fl_bf16 = np.asarray(jax.jit(
            lambda q, k, v: flash_attention(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), bias,
            )
        )(q, k, v)).astype(np.float32)
        fwd_err = float(np.max(np.abs(fl_bf16 - ref)))

        # ---- bf16 grad parity ----
        def loss_flash(q, k, v):
            o = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                                v.astype(jnp.bfloat16), bias)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(xla_ref(q, k, v, bias) ** 2)

        g_f = jax.tree.map(np.asarray, jax.jit(jax.grad(loss_flash,
                                                        (0, 1, 2)))(q, k, v))
        g_r = jax.tree.map(np.asarray, jax.jit(jax.grad(loss_ref,
                                                        (0, 1, 2)))(q, k, v))
        scale = max(float(np.max(np.abs(g))) for g in g_r)
        grad_err = max(
            float(np.max(np.abs(a - bb))) for a, bb in zip(g_f, g_r)
        ) / max(scale, 1e-6)

        # ---- timings: fwd+bwd, flash bf16 vs flash f32 vs xla bf16 ----
        def timed(fn, *args):
            jfn = jax.jit(fn)
            val = jfn(*args)
            float(jnp.sum(val[0] if isinstance(val, tuple) else val))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(30):
                    val = jfn(*args)
                float(jnp.sum(val[0] if isinstance(val, tuple) else val))
                best = min(best, (time.perf_counter() - t0) / 30)
            return best * 1e3  # ms

        qb, kb, vb = (a.astype(jnp.bfloat16) for a in (q, k, v))

        def fb_flash(q, k, v):
            return jax.grad(
                lambda q, k, v: jnp.sum(
                    flash_attention(q, k, v, bias).astype(jnp.float32) ** 2
                ), (0, 1, 2),
            )(q, k, v)

        def fb_xla(q, k, v):
            return jax.grad(
                lambda q, k, v: jnp.sum(xla_ref(q, k, v, bias) ** 2),
                (0, 1, 2),
            )(q, k, v)

        out[f"T{t_len}"] = {
            "fwd_abs_err_bf16": fwd_err,
            "grad_rel_err_bf16": grad_err,
            "ms_flash_bf16_fwdbwd": round(timed(fb_flash, qb, kb, vb), 4),
            "ms_flash_f32_fwdbwd": round(timed(fb_flash, q, k, v), 4),
            "ms_xla_f32_fwdbwd": round(timed(fb_xla, q, k, v), 4),
        }
        flush("flash_bf16", out)


def section_headline():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import bench

    cps = bench.run_one("logmel_pallas", 32, 256, warmup=3, iters=30)
    flush("headline_b32_pallas", round(cps, 2))
    try:
        peak = bench.run_one("logmel_pallas", 256, 256, warmup=2, iters=8,
                             compute_dtype="bfloat16")
        flush("peak_b256_bf16", round(peak, 2))
    except Exception as exc:  # noqa: BLE001
        flush("peak_b256_bf16_error", repr(exc)[:300])


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    flush("platform", jax.default_backend())
    for name, fn in [
        ("bwd_parity", section_bwd_parity),
        ("trainstep_ab", section_trainstep_ab),
        ("flash_bf16", section_flash_bf16),
        ("headline", section_headline),
    ]:
        try:
            fn()
        except Exception as exc:  # noqa: BLE001
            flush(f"{name}_error", repr(exc)[:500])


if __name__ == "__main__":
    main()
