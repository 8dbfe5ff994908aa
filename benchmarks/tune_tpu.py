"""One-shot TPU tuning sweep: scan variants, unroll factors, batch scaling.

Writes benchmarks/tpu_tuning.json incrementally (each section flushed), so
partial results survive. Run in the background and let it exit on its own —
killing a client mid-operation wedges the tunneled terminal.

    python benchmarks/tune_tpu.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).parent / "tpu_tuning.json"
RESULTS: dict = {}


def flush():
    OUT.write_text(json.dumps(RESULTS, indent=2))


def build_step(batch, n_rows, *, frontend, fused, unroll, compute_dtype):
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_train_step,
    )

    cfg = Config()
    apply_overrides(cfg, [
        f"dataset.batch_size={batch}",
        f"model.encoders.audio.fused={'true' if fused else 'false'}",
        f"model.encoders.audio.scan_unroll={unroll}",
        "model.encoders.video.input_dim=4096",
        f"runtime.compute_dtype={compute_dtype}",
    ])
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.use_pallas = frontend == "pallas"
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


def time_steps(state, step, features, labels, batch, n_rows,
               warmup=3, iters=20):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    valid = jnp.ones((batch,), jnp.float32)
    idxs = [
        jnp.asarray((np.arange(batch) + i * batch) % n_rows, jnp.int32)
        for i in range(warmup + iters)
    ]
    metrics = None
    for i in range(warmup):
        state, metrics = step(state, features, labels, idxs[i], valid, key)
    float(metrics["loss"])  # full sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        state, metrics = step(state, features, labels, idxs[i], valid, key)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return batch * iters / dt


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    RESULTS["platform"] = jax.default_backend()
    n_rows = 256

    # --- section 1: scan variant x unroll, batch 32, pallas frontend ---
    section = {}
    for fused in (True, False):
        for unroll in (2, 4, 8):
            name = f"{'fused' if fused else 'layerwise'}_unroll{unroll}"
            try:
                t0 = time.time()
                state, step, feats, labels = build_step(
                    32, n_rows, frontend="pallas", fused=fused,
                    unroll=unroll, compute_dtype="float32",
                )
                cps = time_steps(state, step, feats, labels, 32, n_rows)
                section[name] = {
                    "clips_per_sec": round(cps, 1),
                    "compile_plus_run_s": round(time.time() - t0, 1),
                }
            except Exception as exc:  # salvage partial results
                section[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            RESULTS["scan_variants_b32"] = section
            flush()
            del state, step, feats, labels

    # --- section 2: batch scaling with the best variant ---
    best = max(
        (k for k, v in section.items() if "clips_per_sec" in v),
        key=lambda k: section[k]["clips_per_sec"],
        default="fused_unroll4",
    )
    RESULTS["best_variant_b32"] = best
    fused = best.startswith("fused")
    unroll = int(best.rsplit("unroll", 1)[1])
    scaling = {}
    for batch in (32, 128, 256):
        try:
            state, step, feats, labels = build_step(
                batch, max(n_rows, batch), frontend="pallas", fused=fused,
                unroll=unroll, compute_dtype="float32",
            )
            cps = time_steps(state, step, feats, labels, batch,
                             max(n_rows, batch), iters=10)
            scaling[str(batch)] = round(cps, 1)
        except Exception as exc:
            scaling[str(batch)] = f"{type(exc).__name__}: {exc}"[:300]
        RESULTS["batch_scaling"] = scaling
        flush()
        del state, step, feats, labels

    # --- section 3: bf16 compute at batch 32 and 256 ---
    bf16 = {}
    for batch in (32, 256):
        try:
            state, step, feats, labels = build_step(
                batch, max(n_rows, batch), frontend="pallas", fused=fused,
                unroll=unroll, compute_dtype="bfloat16",
            )
            cps = time_steps(state, step, feats, labels, batch,
                             max(n_rows, batch), iters=10)
            bf16[str(batch)] = round(cps, 1)
        except Exception as exc:
            bf16[str(batch)] = f"{type(exc).__name__}: {exc}"[:300]
        RESULTS["bf16_compute"] = bf16
        flush()
        del state, step, feats, labels

    flush()
    print(json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    main()
