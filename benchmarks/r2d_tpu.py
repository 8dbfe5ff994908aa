"""Round-2d TPU batch: GRU chain kernel + final headline with tuned gating.

1. gru_parity   — GRU grads: in-kernel chain vs XLA scan, flagship shape.
2. gru_ab       — GRU-encoder train step b32, bwd kernel off vs auto.
3. final        — headline b32 + peak b256 bf16 under pure 'auto' defaults
                  (b32 engages both kernels; b256 falls back to scans).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2d_tpu.json"
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


def section_gru_parity():
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_gru,
        set_bwd_kernel_mode,
    )

    b, t, d, h = 32, 375, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    x = jax.random.normal(ks[0], (b, t, d))
    keep = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.1).astype(jnp.float32)
    params = tuple(
        {
            "w_ih": 0.2 * jax.random.normal(ks[2 + 3 * l],
                                            (d if l == 0 else h, 3 * h)),
            "w_hh": 0.2 * jax.random.normal(ks[3 + 3 * l], (h, 3 * h)),
            "b_ih": 0.1 * jax.random.normal(ks[4 + 3 * l], (3 * h,)),
            "b_hh": jnp.zeros((3 * h,)),
        }
        for l in range(2)
    )

    def loss(x, keep, params):
        ys, h_final = fused_gru(x, keep, params)
        return jnp.sum(ys * jnp.cos(ys)) + jnp.sum(h_final ** 2)

    grad_fn = jax.grad(loss, argnums=(0, 2))
    set_bwd_kernel_mode("off")
    g_s = jax.tree.map(np.asarray, jax.jit(grad_fn)(x, keep, params))
    set_bwd_kernel_mode("auto")
    g_k = jax.tree.map(np.asarray, jax.jit(grad_fn)(x, keep, params))
    max_rel = max(
        float(np.max(np.abs(a - bb) / np.maximum(np.abs(a), 1e-3)))
        for a, bb in zip(jax.tree_util.tree_leaves(g_s),
                         jax.tree_util.tree_leaves(g_k))
    )
    flush("gru_parity", {"max_rel_err": max_rel, "pass": max_rel < 5e-4})


def _build_gru(mode, batch, n_rows):
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_train_step,
    )

    set_fwd_kernel_mode("off")  # fwd kernel is LSTM-only
    set_bwd_kernel_mode(mode)
    cfg = Config()
    apply_overrides(cfg, [
        f"dataset.batch_size={batch}",
        "model.encoders.audio.encoder_type=gru",
        "model.encoders.audio.hidden_dim=256",
        "model.encoders.video.input_dim=4096",
    ])
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.use_pallas = True
    model = classifier_from_config(cfg)
    rng = np.random.RandomState(0)
    features = {
        "audio": jnp.asarray(rng.randn(n_rows, 48000, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(n_rows, 24, 4096).astype(np.float32)),
    }
    labels = jnp.asarray(rng.randint(0, 8, n_rows), jnp.int32)
    tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
    sample = {m: a[:batch] for m, a in features.items()}
    state = create_train_state(
        model, tx, sample, jnp.ones((batch, 2), jnp.float32),
        jax.random.PRNGKey(0),
    )
    step = make_train_step(model, tx, num_modalities=2, modality_dropout=0.1,
                           has_batch_stats=bool(state.model_state))
    return state, step, features, labels


def section_gru_ab():
    import bench

    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    batch, n_rows = 32, 256
    built = {m: _build_gru(m, batch, n_rows) for m in ("off", "auto")}
    samples = {"off": [], "auto": []}
    for rep in range(3):
        for mode in ("off", "auto"):
            set_fwd_kernel_mode("off")
            set_bwd_kernel_mode(mode)
            state, step, features, labels = built[mode]
            cps, state = bench._time_steps(
                state, step, features, labels, batch, n_rows,
                warmup=3 if rep == 0 else 1, iters=30,
            )
            built[mode] = (state, step, features, labels)
            samples[mode].append(cps)
    set_fwd_kernel_mode("auto")
    set_bwd_kernel_mode("auto")
    flush("gru_ab_b32", {
        "bwd_scan": round(max(samples["off"]), 2),
        "bwd_kernel": round(max(samples["auto"]), 2),
        "speedup": round(max(samples["auto"]) / max(samples["off"]), 4),
        "samples": {k: [round(v, 1) for v in vs] for k, vs in samples.items()},
    })


def section_final():
    import bench

    cps = bench.run_one("logmel_pallas", 32, 256, warmup=3, iters=30)
    flush("final_headline_b32", round(cps, 2))
    peak = bench.run_one("logmel_pallas", 256, 256, warmup=2, iters=10,
                         compute_dtype="bfloat16")
    flush("final_peak_b256_bf16", round(peak, 2))


def main():
    watchdog()
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    flush("platform", jax.default_backend())
    for name, fn in [("gru_parity", section_gru_parity),
                     ("gru_ab", section_gru_ab),
                     ("final", section_final)]:
        try:
            fn()
        except Exception as exc:  # noqa: BLE001
            flush(f"{name}_error", repr(exc)[:500])


if __name__ == "__main__":
    main()
