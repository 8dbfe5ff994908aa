"""Component ablation of the training step: where does the time go?

One-shot, exit-clean; writes benchmarks/ablation_tpu.json incrementally.
"""
import json, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

OUT = Path(__file__).parent / "ablation_tpu.json"
RESULTS = {}


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax
    setup_jax()
    import jax, jax.numpy as jnp
    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.models.classifier import classifier_from_config
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state, make_train_step)

    RESULTS["platform"] = jax.default_backend()
    batch, n_rows = 32, 64
    rng = np.random.RandomState(0)
    full_feats = {
        "audio": jnp.asarray(rng.randn(n_rows, 48000, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(n_rows, 24, 4096).astype(np.float32)),
    }
    labels = jnp.asarray(rng.randint(0, 8, n_rows), jnp.int32)

    def measure(name, modalities, frontend="logmel", audio_cfg=None):
        try:
            cfg = Config()
            apply_overrides(cfg, [f"dataset.batch_size={batch}",
                                  f"dataset.modalities=[{','.join(modalities)}]",
                                  "model.encoders.video.input_dim=4096"])
            if audio_cfg:
                apply_overrides(cfg, audio_cfg)
            cfg.model.frontend.audio = frontend
            model = classifier_from_config(cfg)
            feats = {m: full_feats[m] for m in modalities}
            tx, _ = build_optimizer(cfg.training, steps_per_epoch=2)
            sample = {m: a[:batch] for m, a in feats.items()}
            state = create_train_state(model, tx, sample,
                                       jnp.ones((batch, len(modalities)), jnp.float32),
                                       jax.random.PRNGKey(0))
            step = make_train_step(model, tx, num_modalities=len(modalities),
                                   modality_dropout=0.1,
                                   has_batch_stats=bool(state.model_state))
            key = jax.random.PRNGKey(0)
            idx = jnp.arange(batch, dtype=jnp.int32)
            valid = jnp.ones((batch,), jnp.float32)
            state, metrics = step(state, feats, labels, idx, valid, key)
            float(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(30):
                state, metrics = step(state, feats, labels, idx, valid, key)
            float(metrics["loss"])
            ms = (time.perf_counter() - t0) / 30 * 1e3
            RESULTS[name] = round(ms, 3)
        except Exception as exc:
            RESULTS[name] = f"{type(exc).__name__}: {exc}"[:200]
        OUT.write_text(json.dumps(RESULTS, indent=2))

    measure("full_av_logmel_ms", ["audio", "video"])
    measure("audio_only_logmel_ms", ["audio"])
    measure("video_only_ms", ["video"])
    measure("audio_only_transformer_ms", ["audio"], audio_cfg=[
        "model.encoders.audio.encoder_type=transformer",
        "model.encoders.audio.num_layers=2",
    ])
    measure("audio_only_cnn_ms", ["audio"], audio_cfg=[
        "model.encoders.audio.encoder_type=cnn",
    ])
    print(json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    main()
