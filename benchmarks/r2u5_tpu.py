"""r2u5: is the chip-side layer-1 residual corruption the full-unroll?

r2u4 (chip): g0/h0/c0 streams exact, g1/ys/c1 wrong from t~3; interpret
matches the reference everywhere.  A/B the kernel with
full_unroll=False/True and both chunk sizes, plus hf itself.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2u5_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def watchdog(seconds=2700):
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

    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_train_fwd_pallas,
    )

    flush("platform", jax.default_backend())

    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x_tm = jax.random.normal(ks[0], (t, b, d))
    keep = (jax.random.uniform(ks[1], (t, b, h)) > 0.2).astype(jnp.float32)
    layer0 = {"w_ih": 0.2 * jax.random.normal(ks[2], (d, 4 * h)),
              "w_hh": 0.2 * jax.random.normal(ks[3], (h, 4 * h)),
              "b": jnp.full((4 * h,), 0.02)}
    layer1 = {"w_ih": 0.2 * jax.random.normal(ks[4], (h, 4 * h)),
              "w_hh": 0.2 * jax.random.normal(ks[5], (h, 4 * h)),
              "b": jnp.full((4 * h,), 0.02)}

    def cell(hc, gates):
        h_, c_ = hc
        i = jax.nn.sigmoid(gates[..., :h])
        f = jax.nn.sigmoid(gates[..., h:2 * h])
        g = jnp.tanh(gates[..., 2 * h:3 * h])
        o = jax.nn.sigmoid(gates[..., 3 * h:])
        c_n = f * c_ + i * g
        return jnp.tanh(c_n) * o, c_n

    @jax.jit
    def ref(x_tm, keep):
        ih0 = x_tm @ layer0["w_ih"] + layer0["b"]

        def step(carry, inp):
            (h0, c0, h1, c1) = carry
            ih0_t, keep_t = inp
            g0 = ih0_t + h0 @ layer0["w_hh"]
            h0n, c0n = cell((h0, c0), g0)
            x1 = h0n * keep_t
            g1 = x1 @ layer1["w_ih"] + layer1["b"] + h1 @ layer1["w_hh"]
            h1n, c1n = cell((h1, c1), g1)
            return (h0n, c0n, h1n, c1n), (g0, g1, h0n, c0n, h1n, c1n)

        z = jnp.zeros((b, h), jnp.float32)
        _, series = jax.lax.scan(step, (z, z, z, z), (ih0, keep))
        return series

    g0r, g1r, h0r, c0r, h1r, c1r = [np.asarray(a) for a in ref(x_tm, keep)]

    for unroll in (False, True):
        for chunk in (8, 16):
            fn = jax.jit(lambda x, k, u=unroll, c=chunk:
                         lstm2_train_fwd_pallas(x, k, layer0, layer1,
                                                chunk=c, full_unroll=u))
            ys, hf, g0, g1, h0n, c0n, c1n = [np.asarray(a)
                                             for a in fn(x_tm, keep)]
            out = {}
            for name, a, b_ in (("g1", g1, g1r), ("ys", ys, h1r),
                                ("c1", c1n, c1r), ("hf", hf, h1r[-1]),
                                ("g0", g0, g0r)):
                out[name] = round(float(
                    np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)), 8)
            flush(f"unroll_{unroll}_chunk{chunk}", out)


if __name__ == "__main__":
    main()
