"""r2u4: which residual series does the fwd train kernel corrupt on chip?

r2u3: outputs (ys, h_final) bitwise-exact, grads-through-residuals wrong
(rel 0.04 with keep=1, ~1.0 with a dropout keep mask).  Compare every
streamed series (g0, g1, h0_new, c0_new, c1_new, ys) against a
straight-line lax.scan reference, with ones and with a keep mask.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2u4_tpu.json"
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

    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_train_fwd_pallas,
    )

    flush("platform", jax.default_backend())

    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x_tm = jax.random.normal(ks[0], (t, b, d))
    keep_ones = jnp.ones((t, b, h), jnp.float32)
    keep_mask = (jax.random.uniform(ks[1], (t, b, h)) > 0.2).astype(
        jnp.float32)
    layer0 = {"w_ih": 0.2 * jax.random.normal(ks[2], (d, 4 * h)),
              "w_hh": 0.2 * jax.random.normal(ks[3], (h, 4 * h)),
              "b": jnp.full((4 * h,), 0.02)}
    layer1 = {"w_ih": 0.2 * jax.random.normal(ks[4], (h, 4 * h)),
              "w_hh": 0.2 * jax.random.normal(ks[5], (h, 4 * h)),
              "b": jnp.full((4 * h,), 0.02)}

    def cell(hc, gates):
        h_, c_ = hc
        hdim = h_.shape[-1]
        i = jax.nn.sigmoid(gates[..., :hdim])
        f = jax.nn.sigmoid(gates[..., hdim:2 * hdim])
        g = jnp.tanh(gates[..., 2 * hdim:3 * hdim])
        o = jax.nn.sigmoid(gates[..., 3 * hdim:])
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

    kfwd = jax.jit(lambda x, k: lstm2_train_fwd_pallas(x, k, layer0, layer1))

    for tag, keep in (("ones", keep_ones), ("mask", keep_mask)):
        g0r, g1r, h0r, c0r, h1r, c1r = [np.asarray(a) for a in
                                        ref(x_tm, keep)]
        ys, hf, g0, g1, h0n, c0n, c1n = [np.asarray(a) for a in
                                         kfwd(x_tm, keep)]
        out = {}
        for name, a, b_ in (("g0", g0, g0r), ("g1", g1, g1r),
                            ("h0_new", h0n, h0r), ("c0_new", c0n, c0r),
                            ("ys", ys, h1r), ("c1_new", c1n, c1r)):
            r = float(np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6))
            # where does the first mismatch appear in time?
            d_t = np.abs(a - b_).max(axis=(1, 2))
            first_bad = int(np.argmax(d_t > 1e-5)) if (d_t > 1e-5).any() \
                else -1
            out[name] = {"rel": round(r, 8), "first_bad_t": first_bad}
        flush(tag, out)


if __name__ == "__main__":
    main()
