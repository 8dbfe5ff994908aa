"""Round-2l TPU batch: vmapped sweep + ensemble paths run on-chip."""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r2l_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:200]}")


def main():
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", "unresponsive")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(1800)

    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader
    from multimodal_emotion_detection_tpu.data.synthetic import (
        synthetic_arrays,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        MultimodalClassifier,
    )
    from multimodal_emotion_detection_tpu.parallel.vmap_sweep import (
        train_ensemble,
        vmapped_lr_sweep,
    )
    from multimodal_emotion_detection_tpu.uncertainty.ensemble import (
        ensemble_predict,
    )

    flush("platform", jax.default_backend())
    model = MultimodalClassifier(
        modalities=("s1",),
        encoder_configs={"s1": {"type": "sequence", "encoder_type": "lstm",
                                "input_dim": 8, "hidden_dim": 256,
                                "num_layers": 2, "dropout": 0.0}},
        num_classes=4, output_dim=16, hidden_dim=32, dropout=0.0,
    )
    arrays = synthetic_arrays(64, 4, {"s1": 8}, 40, "train", seed=3)
    loader = MultimodalLoader(arrays, batch_size=16, shuffle=True, seed=3)

    try:
        results = vmapped_lr_sweep(model, loader, loader, [1e-3, 3e-3],
                                   epochs=1, seed=6)
        flush("vmapped_lr_sweep", {
            "ok": all(np.isfinite(r["best_val_loss"]) for r in results),
            "losses": [round(float(r["best_val_loss"]), 4) for r in results],
        })
    except Exception as exc:  # noqa: BLE001
        flush("vmapped_lr_sweep_error", repr(exc)[:400])

    try:
        stacked, stacked_state = train_ensemble(
            model, loader, n_members=2, epochs=1)
        feats = {"s1": jnp.asarray(arrays.features["s1"][:16])}
        probs, unc = ensemble_predict(model, stacked, stacked_state, feats,
                                      num_modalities=1)
        flush("ensemble", {
            "ok": bool(np.isfinite(np.asarray(probs)).all()),
            "probs_shape": list(np.asarray(probs).shape),
        })
    except Exception as exc:  # noqa: BLE001
        flush("ensemble_error", repr(exc)[:400])


if __name__ == "__main__":
    main()
