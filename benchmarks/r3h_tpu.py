"""r3h: (a) per-encoder bf16 for the video/frame encoder on chip,
(b) convergence-level outcome check for bf16 residual streams.

r3f measured the frame encoder's f32 dense fwd+bwd at ~0.6 ms isolated
(b32) — a candidate for the per-encoder 'dtype' knob.  Legs (interleaved):

  fast            — rbg + bf16 residuals (configs/fast.yaml regime)
  fast_vbf16      — same + model.encoders.video.dtype=bfloat16

plus isolated FrameEncoder fwd+bwd f32 vs bf16, and LAST the outcome
check: train the flagship-geometry model (LSTM h256 + frame encoder) to
early-stop on identical learnable synthetic data with f32 vs bf16
residual streams; compare best-val-loss and test-accuracy.  The r3g
envelope at T=372 (max rel ~0.1, the chip's own chaos floor) says
per-step gradients differ; this says whether OUTCOMES do.

Writes r3h_tpu.json incrementally.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from benchmarks.r3a_tpu import chained_ms  # noqa: E402
from benchmarks.r3f_tpu import build_flagship  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3h_tpu.json")
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


def build_fast(video_bf16=False):
    """Flagship epoch-scan step under the fast.yaml regime knobs."""
    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    lv.set_res2_dtype("bfloat16")
    try:
        if not video_bf16:
            return build_flagship()
        # rebuild with the video encoder dtype override
        import jax
        import jax.numpy as jnp

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

        cfg = B._bench_config("logmel_cached", 32)
        cfg.model.encoders["video"]["dtype"] = "bfloat16"
        model = classifier_from_config(cfg)
        rng = np.random.RandomState(0)
        features = {
            "audio": jnp.asarray(rng.randn(256, 48000, 1), jnp.float32),
            "video": jnp.asarray(rng.rand(256, 24, 4096).astype(np.float32)),
        }
        labels = jnp.asarray(rng.randint(0, 8, 256), jnp.int32)
        lp = logmel_params_from_config(cfg.model.frontend)
        features["audio"] = jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
        )(features["audio"])
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
        sample = {m: a[:32] for m, a in features.items()}
        state = create_train_state(
            model, tx, sample, jnp.ones((32, 2), jnp.float32),
            jax.random.PRNGKey(0),
        )
        step = make_epoch_train_step(
            model, tx, num_modalities=2, modality_dropout=0.1,
            has_batch_stats=bool(state.model_state),
        )
        return state, step, features, labels, cfg, model, tx
    finally:
        lv.set_res2_dtype("float32")


def time_fast(state, estep, f, l):
    import jax

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    lv.set_res2_dtype("bfloat16")
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        return B._time_epoch_scan(state, estep, f, l, 32, 256,
                                  warmup=1, iters=8)
    finally:
        lv.set_res2_dtype("float32")
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def outcome_leg(res_dtype, tmp, hard=False):
    """Train flagship-geometry model to early-stop on learnable synthetic
    AV data; return (best_val_loss, test_acc).

    ``hard``: weak class separation confined to a few dims + 15% train
    label noise — caps attainable accuracy below 1.0 so the two residual
    dtypes can actually DIFFER in outcome (the easy task saturates both
    at 1.0/0.0, which only shows neither breaks training)."""
    from multimodal_emotion_detection_tpu.config import Config
    from multimodal_emotion_detection_tpu.data.dataset import (
        MultimodalArrays,
    )
    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader
    from multimodal_emotion_detection_tpu.training.loop import Trainer

    A_T, A_D, V_T, V_D, NC = 372, 64, 24, 4096, 8
    rng = np.random.RandomState(0)
    if hard:
        means_a = np.zeros((NC, A_D), np.float32)
        means_a[:, :6] = rng.randn(NC, 6) * 0.22
        means_v = np.zeros((NC, V_D), np.float32)
    else:
        means_a = rng.randn(NC, A_D) * 0.8
        means_v = rng.randn(NC, V_D) * 0.15

    def make(n, salt, noise=0.0):
        r = np.random.RandomState(1000 + salt)
        y = r.randint(0, NC, size=n)
        a = (r.randn(n, A_T, A_D) + means_a[y][:, None, :]).astype(np.float32)
        v = (r.randn(n, V_T, V_D) + means_v[y][:, None, :]).astype(np.float32)
        y_out = y.copy()
        if noise:
            flip = r.rand(n) < noise
            y_out[flip] = r.randint(0, NC, size=int(flip.sum()))
        return a, v, y_out.astype(np.int32)

    tr = make(512, 1, noise=0.15 if hard else 0.0)
    va = make(128, 2)
    te = make(128, 3)

    def loader(split, shuffle):
        a, v, y = split
        return MultimodalLoader(
            MultimodalArrays(features={"audio": a, "video": v}, labels=y,
                             modalities=["audio", "video"]),
            batch_size=32, shuffle=shuffle, drop_last=shuffle, seed=11,
        )

    cfg = Config()
    cfg.dataset.modalities = ["audio", "video"]
    cfg.dataset.num_classes = NC
    cfg.dataset.batch_size = 32
    cfg.model.encoders = {
        "audio": {"type": "sequence", "encoder_type": "lstm",
                  "input_dim": A_D, "hidden_dim": 256, "num_layers": 2},
        "video": {"type": "frame", "input_dim": V_D, "hidden_dim": 256},
    }
    cfg.model.output_dim = 128
    cfg.model.hidden_dim = 256
    cfg.training.max_epochs = 25
    cfg.training.early_stopping_patience = 5
    cfg.training.learning_rate = 1e-3
    cfg.training.augmentation.modality_dropout = 0.0
    cfg.runtime.epoch_scan = "on"
    cfg.runtime.lstm_residual_dtype = res_dtype

    t = Trainer(cfg, save_dir=os.path.join(tmp, res_dtype))
    t.fit(loader(tr, True), loader(va, False))
    best_val = float(t.checkpoints.best_model_score)
    metrics, _, _, _ = t.test(loader(te, False), state=t.load_best())
    return best_val, float(metrics["test/acc"]), len(t.history)


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    watchdog()
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())

    if "--outcome-hard" in sys.argv:
        import tempfile

        tmp = tempfile.mkdtemp(prefix="r3h_outcome_hard_")
        for dtype in ("float32", "bfloat16"):
            bv, acc, n_ep = outcome_leg(dtype, tmp, hard=True)
            flush(f"outcome_hard_{dtype}", {"best_val_loss": round(bv, 4),
                                            "test_acc": round(acc, 4),
                                            "epochs": n_ep})
        print("DONE", flush=True)
        return

    # ---- perf legs ----
    st_a, ep_a, f_a, l_a, *_ = build_fast(video_bf16=False)
    st_b, ep_b, f_b, l_b, *_ = build_fast(video_bf16=True)
    # warm both under fast knobs
    _, st_a = time_fast(st_a, ep_a, f_a, l_a)
    _, st_b = time_fast(st_b, ep_b, f_b, l_b)
    for rnd in (1, 2):
        cps, st_a = time_fast(st_a, ep_a, f_a, l_a)
        flush(f"escan_b32_fast_r{rnd}_cps", round(cps, 1))
        cps, st_b = time_fast(st_b, ep_b, f_b, l_b)
        flush(f"escan_b32_fast_vbf16_r{rnd}_cps", round(cps, 1))

    # ---- isolated FrameEncoder f32 vs bf16 ----
    from multimodal_emotion_detection_tpu.models.encoders import FrameEncoder

    rng = np.random.RandomState(0)
    xv = jnp.asarray(rng.rand(32, 24, 4096), jnp.float32)
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        enc = FrameEncoder(frame_dim=4096, hidden_dim=256, output_dim=128,
                           dtype=dt)
        vv = jax.jit(lambda k: enc.init(k, xv))(jax.random.PRNGKey(0))
        g = jax.grad(
            lambda v, x: jnp.sum(enc.apply(v, x, deterministic=True)
                                 .astype(jnp.float32)), argnums=1)
        flush(f"video_fwdbwd_b32_{tag}_ms", round(chained_ms(g, vv, xv), 4))

    # ---- outcome check (LAST: longest) ----
    import tempfile

    tmp = tempfile.mkdtemp(prefix="r3h_outcome_")
    for dtype in ("float32", "bfloat16"):
        bv, acc, n_ep = outcome_leg(dtype, tmp)
        flush(f"outcome_{dtype}", {"best_val_loss": round(bv, 4),
                                   "test_acc": round(acc, 4),
                                   "epochs": n_ep})
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
