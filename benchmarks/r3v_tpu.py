"""r3v: why does the transformer step anti-scale with batch?

r3u found super-linear ms/step growth on the XLA-MHA route (b32 2.32 ms
-> b64 5.98 -> b128 15.96 bf16; ~2.5x per batch doubling where linear
would hold clips/s flat).  This probe traces the b32 and b128 bf16
epoch-scan steps and banks the top-op tables so the quadratic term is
named with data (suspects: materialized (B,H,T,T) score tensors blowing
past a cache/bandwidth knee, dropout PRNG, XLA remat choices).

Writes r3v_tpu.json incrementally.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3v_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {json.dumps(value)[:160]}", flush=True)


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

    def trace(batch):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={batch}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=transformer",
            "model.encoders.video.input_dim=4096",
            "runtime.compute_dtype=bfloat16",
        ])
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.cache = True
        model = classifier_from_config(cfg)
        lp = logmel_params_from_config(cfg.model.frontend)
        feats = {"audio": jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
        )(audio_raw), "video": video}
        S = N // batch
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
            jnp.int32) for e in range(8)]
        vmat = jnp.ones((S, batch), jnp.float32)
        m = None
        for e in range(3):
            state, m = step(state, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        tdir = f"/tmp/r3v_trace_b{batch}"
        n_steps = 5 * S
        jax.profiler.start_trace(tdir)
        for e in range(3, 8):
            state, m = step(state, feats, labels, mats[e], vmat, key)
        float(m["loss"][-1])
        jax.profiler.stop_trace()
        paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
        with gzip.open(sorted(paths)[-1], "rt") as f:
            tr = json.load(f)
        by_name = defaultdict(float)
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                by_name[ev.get("name", "?")] += ev["dur"]
        top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
        flush(f"trace_top_ops_ms_per_step_b{batch}",
              [[n, round(us / 1e3 / n_steps, 4)] for n, us in top])

    if "trace_top_ops_ms_per_step_b32" not in RESULTS:
        trace(32)
    if "trace_top_ops_ms_per_step_b128" not in RESULTS:
        trace(128)

    # If the quadratic term is materialized-scores traffic, flash should
    # win at mid batch even though the auto threshold (B*H*T^2 >= 2^27)
    # routes XLA there.  Interleaved A/B: auto (XLA at these shapes) vs
    # forced flash, b64 and b128 bf16.
    import time

    def run_once(batch, use_flash):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={batch}",
            "model.encoders.audio.hidden_dim=256",
            "model.encoders.audio.encoder_type=transformer",
            f"model.encoders.audio.use_flash={use_flash}",
            "model.encoders.video.input_dim=4096",
            "runtime.compute_dtype=bfloat16",
        ])
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.cache = True
        model = classifier_from_config(cfg)
        lp = logmel_params_from_config(cfg.model.frontend)
        feats = {"audio": jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
        )(audio_raw), "video": video}
        S = N // batch
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

        def epochs(lo, hi, st):
            m = None
            for e in range(lo, hi):
                st, m = step(st, feats, labels, mats[e], vmat, key)
            float(m["loss"][-1])
            return st

        state = epochs(0, 3, state)
        t0 = time.perf_counter()
        state = epochs(3, 11, state)
        dt = time.perf_counter() - t0
        return round(8 * N / dt, 1)

    for batch in (64, 128):
        for mode in ("auto", "true"):
            cps = run_once(batch, mode)
            flush(f"escan_b{batch}_bf16_flash_{mode}_cps", cps)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
