"""r3r: flash-vs-XLA in the two regimes r3q left unresolved.

r3q pinned the b32 full-step crossover at T>=1024, but 'auto' also has
to route (a) the blockwise long-context path, where 512-frame blocks are
folded into the batch axis (raw-waveform transformer: T=48000 -> folded
batch ~3000, where the XLA stored-probs backward materializes ~6 GB of
scores), and (b) the b256 throughput regime at the flagship T=375,
where the scores tensor (256,4,375,375) is already 268 MB — the bytes
criterion and the T criterion disagree there.  Both regimes measured on
the PRODUCTION epoch-scan train step (cached frontend, dropout active,
rbg, bf16):

  block_T8192_b32   cached features T=8192 > max_len=4096 -> blockwise
                    (nb=16, folded batch 512, block 512)
  b256_T375         flagship length at the throughput batch
  b256_T512

Writes r3r_tpu.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r3r_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:240]}", flush=True)


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

    from multimodal_emotion_detection_tpu.config import (
        Config,
        apply_overrides,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.optim import (
        build_optimizer,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_epoch_train_step,
    )

    watchdog()
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    rng = np.random.RandomState(0)

    def build(T, Bb, N, use_flash):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={Bb}",
            "runtime.compute_dtype=bfloat16",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=transformer",
            f"model.encoders.audio.use_flash={'true' if use_flash else 'false'}",
            "model.encoders.video.input_dim=4096",
        ])
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.cache = True
        model = classifier_from_config(cfg)
        n_mels = cfg.model.frontend.n_mels
        feats = {
            "audio": jnp.asarray(
                rng.rand(N, T, n_mels).astype(np.float32)),
            "video": jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32)),
        }
        labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
        sample = {m: a[:Bb] for m, a in feats.items()}
        state = create_train_state(
            model, tx, sample, jnp.ones((Bb, 2), jnp.float32),
            jax.random.PRNGKey(0))
        md = cfg.training.augmentation.modality_dropout
        step = make_epoch_train_step(
            model, tx, num_modalities=2, modality_dropout=md,
            has_batch_stats=bool(state.model_state), donate=False)
        return state, step, feats, labels

    # (name, T, batch, dataset rows, steps/epoch)
    REGIMES = [
        ("block_T8192_b32", 8192, 32, 64, 2),
        ("b256_T375", 375, 256, 512, 2),
        ("b256_T512", 512, 256, 512, 2),
    ]

    legs = {f"{n}_{k}": 0.0 for n, *_ in REGIMES for k in ("flash", "xla")}
    built = {}
    for rnd in range(2):
        for name, T, Bb, N, S in REGIMES:
            for kind in ("flash", "xla"):
                leg = f"{name}_{kind}"
                if leg not in built:
                    built[leg] = build(T, Bb, N, kind == "flash")
                st, ep, feats, labels = built[leg]
                key = jax.random.PRNGKey(0)
                mats = [jnp.asarray(
                    (np.arange(S * Bb).reshape(S, Bb) + e * S * Bb) % N,
                    jnp.int32) for e in range(7)]
                vmat = jnp.ones((S, Bb), jnp.float32)
                for e in range(2):
                    st, m = ep(st, feats, labels, mats[e], vmat, key)
                float(m["loss"][-1])
                t0 = time.perf_counter()
                for e in range(2, 7):
                    st, m = ep(st, feats, labels, mats[e], vmat, key)
                float(m["loss"][-1])
                cps = round(5 * S * Bb / (time.perf_counter() - t0), 1)
                legs[leg] = max(legs[leg], cps)
                built[leg] = (st, ep, feats, labels)
        flush(f"round{rnd}", dict(legs))

    summary = {}
    for name, *_ in REGIMES:
        f, x = legs[f"{name}_flash"], legs[f"{name}_xla"]
        summary[name] = {"flash_cps": f, "xla_cps": x,
                         "flash_speedup": round(f / x, 3)}
    flush("summary", summary)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
