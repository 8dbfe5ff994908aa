"""Throughput of the reference's BIG sweep configuration (SURVEY.md §6:
output_dim 256 / hidden 512 / LSTM x3 audio, 6.3 M params) — the model the
reference's grid results were produced with. One-shot, exit-clean."""
import json, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

OUT = Path(__file__).parent / "big_config_tpu.json"
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
    from multimodal_emotion_detection_tpu.utils.tree import count_params

    RESULTS["platform"] = jax.default_backend()
    batch, n_rows = 32, 64
    rng = np.random.RandomState(0)
    feats = {
        "audio": jnp.asarray(rng.randn(n_rows, 48000, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(n_rows, 24, 4096).astype(np.float32)),
    }
    labels = jnp.asarray(rng.randint(0, 8, n_rows), jnp.int32)

    def measure(name, frontend):
        try:
            cfg = Config()
            apply_overrides(cfg, [
                f"dataset.batch_size={batch}",
                "model.output_dim=256",
                "model.hidden_dim=512",
                "model.encoders.audio.hidden_dim=512",
                "model.encoders.audio.output_dim=256",
                "model.encoders.audio.num_layers=3",
                "model.encoders.video.hidden_dim=512",
                "model.encoders.video.output_dim=256",
                "model.encoders.video.input_dim=4096",
            ])
            cfg.model.frontend.audio = frontend
            model = classifier_from_config(cfg)
            tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
            sample = {m: a[:batch] for m, a in feats.items()}
            state = create_train_state(model, tx, sample,
                                       jnp.ones((batch, 2), jnp.float32),
                                       jax.random.PRNGKey(0))
            RESULTS.setdefault("num_params", count_params(state.params))
            step = make_train_step(model, tx, num_modalities=2,
                                   modality_dropout=0.1,
                                   has_batch_stats=bool(state.model_state))
            key = jax.random.PRNGKey(0)
            idx = jnp.arange(batch, dtype=jnp.int32)
            valid = jnp.ones((batch,), jnp.float32)
            state, metrics = step(state, feats, labels, idx, valid, key)
            float(metrics["loss"])
            iters = 20 if frontend == "logmel" else 5
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, feats, labels, idx, valid, key)
            float(metrics["loss"])
            cps = batch * iters / (time.perf_counter() - t0)
            RESULTS[name] = round(cps, 1)
        except Exception as exc:
            RESULTS[name] = f"{type(exc).__name__}: {exc}"[:200]
        OUT.write_text(json.dumps(RESULTS, indent=2))

    measure("big_logmel_clips_per_sec", "logmel")
    measure("big_raw48k_clips_per_sec", "raw")

    # session-3 point: cached frontend + epoch-scan driver (the Trainer
    # defaults), same big model
    try:
        from multimodal_emotion_detection_tpu.models.classifier import (
            logmel_params_from_config,
        )
        from multimodal_emotion_detection_tpu.ops.logmel import (
            log_mel_spectrogram,
        )
        from multimodal_emotion_detection_tpu.training.steps import (
            make_epoch_train_step,
        )

        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={batch}",
            "model.output_dim=256",
            "model.hidden_dim=512",
            "model.encoders.audio.hidden_dim=512",
            "model.encoders.audio.output_dim=256",
            "model.encoders.audio.num_layers=3",
            "model.encoders.video.hidden_dim=512",
            "model.encoders.video.output_dim=256",
            "model.encoders.video.input_dim=4096",
        ])
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.cache = True
        model = classifier_from_config(cfg)
        lp = logmel_params_from_config(cfg.model.frontend)
        feats_c = dict(feats)
        feats_c["audio"] = jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
        )(feats["audio"])
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
        sample = {m: a[:batch] for m, a in feats_c.items()}
        state = create_train_state(model, tx, sample,
                                   jnp.ones((batch, 2), jnp.float32),
                                   jax.random.PRNGKey(0))
        estep = make_epoch_train_step(
            model, tx, num_modalities=2, modality_dropout=0.1,
            has_batch_stats=bool(state.model_state))
        S = 8
        idx_mat = jnp.asarray(
            (np.arange(S * batch).reshape(S, batch)) % n_rows, jnp.int32)
        valid_mat = jnp.ones((S, batch), jnp.float32)
        key = jax.random.PRNGKey(0)
        state, m = estep(state, feats_c, labels, idx_mat, valid_mat, key)
        float(m["loss"][-1])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = estep(state, feats_c, labels, idx_mat, valid_mat, key)
        float(m["loss"][-1])
        RESULTS["big_cached_scan_clips_per_sec"] = round(
            S * batch * iters / (time.perf_counter() - t0), 1)
    except Exception as exc:  # noqa: BLE001
        RESULTS["big_cached_scan_clips_per_sec"] = (
            f"{type(exc).__name__}: {exc}"[:200])
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    main()
