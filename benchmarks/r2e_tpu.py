"""Round-2e TPU batch: flash-attention shape/dtype coverage sweep.

(H, D) in {(4,64), (8,32), (2,128)} x dtype {f32, bf16} x T {375, 3000}:
fwd+bwd parity vs an fp32 XLA reference and min-of-3x30 timings vs the
XLA attention path in the same dtype.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2e_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def watchdog(seconds=2400):
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

    from multimodal_emotion_detection_tpu.ops.flash_attention import (
        flash_attention,
    )

    flush("platform", jax.default_backend())

    def xla_ref(q, k, v, bias):
        scale = 1.0 / (q.shape[-1] ** 0.5)
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        s = s + bias[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p,
                          v.astype(jnp.float32)).astype(q.dtype)

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
        return best * 1e3

    out = {}
    b = 8
    for (h, d) in [(4, 64), (8, 32), (2, 128)]:
        for t_len in (375, 3000):
            ks = jax.random.split(jax.random.PRNGKey(h * 100 + d), 4)
            qf = jax.random.normal(ks[0], (b, h, t_len, d))
            kf = jax.random.normal(ks[1], (b, h, t_len, d))
            vf = jax.random.normal(ks[2], (b, h, t_len, d))
            bias = jnp.where(
                jax.random.uniform(ks[3], (b, t_len)) > 0.1, 0.0, -1e9
            ).astype(jnp.float32)
            ref = np.asarray(jax.jit(xla_ref)(qf, kf, vf, bias))
            for dtype_name, dt in (("f32", jnp.float32),
                                   ("bf16", jnp.bfloat16)):
                q, k, v = (a.astype(dt) for a in (qf, kf, vf))
                fl = np.asarray(jax.jit(
                    lambda q, k, v: flash_attention(q, k, v, bias)
                )(q, k, v)).astype(np.float32)
                fwd_err = float(np.max(np.abs(fl - ref)))

                def fb_flash(q, k, v):
                    return jax.grad(
                        lambda q, k, v: jnp.sum(
                            flash_attention(q, k, v, bias).astype(
                                jnp.float32) ** 2
                        ), (0, 1, 2),
                    )(q, k, v)

                def fb_xla(q, k, v):
                    return jax.grad(
                        lambda q, k, v: jnp.sum(
                            xla_ref(q, k, v, bias).astype(jnp.float32) ** 2
                        ), (0, 1, 2),
                    )(q, k, v)

                key = f"H{h}_D{d}_T{t_len}_{dtype_name}"
                try:
                    out[key] = {
                        "fwd_abs_err": fwd_err,
                        "ms_flash_fwdbwd": round(timed(fb_flash, q, k, v), 4),
                        "ms_xla_fwdbwd": round(timed(fb_xla, q, k, v), 4),
                    }
                except Exception as exc:  # noqa: BLE001
                    out[key] = {"error": repr(exc)[:300]}
                flush("flash_shapes", out)


if __name__ == "__main__":
    main()
