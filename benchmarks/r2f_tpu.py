"""Round-2f TPU batch: component-level step breakdown at the flagship shape.

Times each stage of the batch-32 train step in isolation (min-of-3x30,
fetch-synced) so the next-round roadmap targets the real bottleneck:
log-mel frontend, LSTM fwd (kernel vs scan), LSTM fwd+bwd (kernels vs
scans), frame encoder fwd+bwd, concat head, full step.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2f_tpu.json"
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

    from multimodal_emotion_detection_tpu.models.encoders import (
        FrameEncoder,
    )
    from multimodal_emotion_detection_tpu.models.recurrent import (
        FusedStackedRNN,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import (
        LogMelParams,
        log_mel_spectrogram,
    )
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_lstm,
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    flush("platform", jax.default_backend())
    b = 32

    def timed(fn, *args):
        jfn = jax.jit(fn)
        val = jfn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(val)[0]))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(30):
                val = jfn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(val)[0]))
            best = min(best, (time.perf_counter() - t0) / 30)
        return round(best * 1e3, 4)

    out = {}

    # 1. log-mel frontend (pallas vs xla)
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, 48000, 1))
    params = LogMelParams()
    out["logmel_pallas_ms"] = timed(
        lambda w: log_mel_spectrogram(w, params, use_pallas=True), wave)
    out["logmel_xla_ms"] = timed(
        lambda w: log_mel_spectrogram(w, params, use_pallas=False), wave)
    flush("breakdown", out)

    # 2. LSTM at (32, 375, 64) -> H 256: fwd and fwd+bwd, kernels vs scans
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 375, 64))
    keep = jnp.ones((b, 375, 1, 256), jnp.float32)
    rnn = FusedStackedRNN(hidden_dim=256, num_layers=2, cell_type="lstm")
    variables = jax.jit(lambda k: rnn.init(k, x))(jax.random.PRNGKey(2))
    p = variables["params"]
    lstm_params = (
        {k: v for k, v in p["layer_0"].items()},
        {k: v for k, v in p["layer_1"].items()},
    )

    def loss(x):
        ys, hf = fused_lstm(x, keep, lstm_params)
        return jnp.sum(hf ** 2)

    for name, (fm, bm) in {
        "scans": ("off", "off"),
        "kernels": ("auto", "auto"),
    }.items():
        set_fwd_kernel_mode(fm)
        set_bwd_kernel_mode(bm)
        out[f"lstm_fwd_{name}_ms"] = timed(
            lambda x: fused_lstm(x, keep, lstm_params)[1], x)
        out[f"lstm_fwdbwd_{name}_ms"] = timed(jax.grad(loss), x)
        flush("breakdown", out)
    set_fwd_kernel_mode("auto")
    set_bwd_kernel_mode("auto")

    # 3. frame encoder fwd+bwd (24 frames x 4096)
    frames = jax.random.normal(jax.random.PRNGKey(3), (b, 24, 4096))
    enc = FrameEncoder(frame_dim=4096, hidden_dim=256, output_dim=128,
                       dropout=0.0)
    ev = jax.jit(lambda k: enc.init(k, frames))(jax.random.PRNGKey(4))

    def enc_loss(params, frames):
        return jnp.sum(enc.apply({"params": params}, frames) ** 2)

    out["frame_encoder_fwdbwd_ms"] = timed(
        jax.grad(enc_loss), ev["params"], frames)
    flush("breakdown", out)

    # 4. full train step (both kernel settings) for cross-reference
    import bench

    state, step, features, labels = bench._build("logmel_pallas", b, 256)
    idx = jnp.arange(b, dtype=jnp.int32)
    valid = jnp.ones((b,), jnp.float32)
    key = jax.random.PRNGKey(0)
    new_state, metrics = step(state, features, labels, idx, valid, key)
    float(metrics["loss"])
    best = np.inf
    st = new_state
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(30):
            st, metrics = step(st, features, labels, idx, valid, key)
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / 30)
    out["full_step_ms"] = round(best * 1e3, 4)
    flush("breakdown", out)


if __name__ == "__main__":
    main()
