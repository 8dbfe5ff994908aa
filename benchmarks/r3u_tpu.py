"""r3u: transformer-family batch regime (throughput point).

Every other family row has a throughput-regime anchor (flagship b256
bf16, big-config b256-b512 bf16); the transformer row only has b32.
This probe sweeps batch x dtype on the production transformer epoch-scan
step (cached log-mel, rbg PRNG, use_flash='auto' — which routes XLA MHA
at b32/T375 and the flash kernel from b256 up, r3r) and banks the
regime map: clips/s and ms/step at b32/b64/b128/b256, bf16 and f32.

Writes r3u_tpu.json incrementally.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3u_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {json.dumps(value)[:200]}", flush=True)


def watchdog(seconds=3300):
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
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import (
        log_mel_spectrogram,
    )
    from multimodal_emotion_detection_tpu.training.optim import (
        build_optimizer,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_epoch_train_step,
    )

    watchdog()
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    N = 512
    rng = np.random.RandomState(0)
    audio_raw = jnp.asarray(rng.randn(N, 48000, 1), jnp.float32)
    video = jnp.asarray(rng.rand(N, 24, 4096).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, N), jnp.int32)

    def run(batch, compute_dtype):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={batch}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=transformer",
            "model.encoders.video.input_dim=4096",
            f"runtime.compute_dtype={compute_dtype}",
        ])
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.cache = True
        model = classifier_from_config(cfg)
        lp = logmel_params_from_config(cfg.model.frontend)
        feats = {"audio": jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
        )(audio_raw), "video": video}
        S = max(1, N // batch)
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=S)
        sample = {m: a[:batch] for m, a in feats.items()}
        state = create_train_state(
            model, tx, sample, jnp.ones((batch, 2), jnp.float32),
            jax.random.PRNGKey(0))
        step = make_epoch_train_step(
            model, tx, num_modalities=2, modality_dropout=0.1,
            has_batch_stats=bool(state.model_state), donate=False)
        key = jax.random.PRNGKey(0)
        mats = [jnp.asarray(
            (np.arange(S * batch).reshape(S, batch) + e) % N,
            jnp.int32) for e in range(11)]
        vmat = jnp.ones((S, batch), jnp.float32)
        m = None
        for e in range(3):
            state, m = step(state, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        t0 = time.perf_counter()
        for e in range(3, 11):
            state, m = step(state, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        dt = time.perf_counter() - t0
        cps = 8 * S * batch / dt
        return round(cps, 1), round(batch / cps * 1e3, 4)

    for dtype in ("bfloat16", "float32"):
        for batch in (32, 64, 128, 256):
            cps, ms = run(batch, dtype)
            flush(f"escan_b{batch}_{dtype}_cps", cps)
            flush(f"escan_b{batch}_{dtype}_ms_per_step", ms)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
