"""r2u2: isolate the b64 (2-tile grid) on-chip gradient mismatch.

Interpret mode passes at b64 (rel 7e-6), the chip fails (rel 0.106) —
a Mosaic-only defect in some tile>1 path.  Components A/B'd on chip at
b64, each against the XLA custom-VJP reference:

  fwd_only  - training-forward kernel on, backward kernel off
  bwd_only  - forward off (XLA scan forward), backward chain kernel on
  both      - the combination (reproduces r2u)
  b32_both  - control: single-tile path must still pass
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2u2_tpu.json"
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


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    import multimodal_emotion_detection_tpu.ops.lstm_kernel as lk
    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    flush("platform", jax.default_backend())
    lk._AUTO_MAX_BATCH = 256

    def build(b, t=375, d=64, h=256):
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        x = jax.random.normal(ks[0], (b, t, d))
        keep = jnp.ones((b, t, 1, h), jnp.float32)
        params = tuple(
            {"w_ih": 0.2 * jax.random.normal(
                ks[2 + 2 * i], (d if i == 0 else h, 4 * h)),
             "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
             "b": jnp.full((4 * h,), 0.02)}
            for i in range(2)
        )
        return x, keep, params

    def grads(x, keep, params, fwd_mode, bwd_mode):
        lv.set_fwd_kernel_mode(fwd_mode)
        lv.set_bwd_kernel_mode(bwd_mode)

        def loss(x, keep, params):
            hf = lv.fused_lstm_final(x, keep, params)
            return jnp.sum(hf * jnp.sin(hf))

        return jax.tree_util.tree_map(
            np.asarray,
            jax.jit(jax.grad(loss, argnums=(0, 2)))(x, keep, params))

    def rel(g1, g2):
        rels = []
        for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                         jax.tree_util.tree_leaves(g2)):
            rels.append(
                float(np.abs(a - b_).max() / max(np.abs(a).max(), 1e-6)))
        return max(rels)

    for b, tag in ((32, "b32"), (64, "b64")):
        x, keep, params = build(b)
        ref = grads(x, keep, params, "off", "off")
        for name, fm, bm in (("fwd_only", "auto", "off"),
                             ("bwd_only", "off", "auto"),
                             ("both", "auto", "auto")):
            r = rel(grads(x, keep, params, fm, bm), ref)
            flush(f"{tag}_{name}", {"max_rel": r, "pass": r < 1e-4})


if __name__ == "__main__":
    main()
