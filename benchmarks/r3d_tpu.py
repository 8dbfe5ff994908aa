"""r3d: where does the big sweep config (LSTM x3, hidden 512, out 256 —
the model behind every BASELINE.md number) spend its step, and why is its
MFU (0.228) below the flagship's (0.301)?

The 3-layer audio stack routes differently from the flagship's 2-layer
one: the fused residual-native kernel pair requires exactly 2 layers
(ops/lstm_vjp.py:_res2_ok / _fwd_kernel_ok), so the big config runs an
XLA scan forward + per-layer reverse-chain kernels backward
(_bwd_layered_pallas).

Probes (interleaved same-process A/Bs, epoch-scan driver, b32 fp32):
1. baseline big-config cps (epoch-scan + per-step)
2. bwd kernel gate on/off (is the per-layer bwd kernel winning at h512?)
3. 2-layer h512 config (kernel-eligible) vs 3-layer — how much does the
   third layer + scan-forward cost?
4. fwd-only (loss eval) time — splits fwd vs bwd share.

Writes benchmarks/r3d_tpu.json incrementally.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench as B  # noqa: E402

OUT = Path(__file__).parent / "r3d_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:160]}", flush=True)


def time_epoch(state, estep, feats, labels, batch, n_rows, S=8, reps=8,
               warmup=2):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    mat = jnp.asarray(np.arange(S * batch).reshape(S, batch) % n_rows,
                      jnp.int32)
    vmat = jnp.ones((S, batch), jnp.float32)
    m = None
    for _ in range(warmup):
        state, m = estep(state, feats, labels, mat, vmat, key)
    float(m["loss"][-1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, m = estep(state, feats, labels, mat, vmat, key)
        float(m["loss"][-1])
        best = min(best, time.perf_counter() - t0)
    return S * batch / best, state


def time_step(state, step, feats, labels, batch, reps=30, warmup=3):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    idx = jnp.arange(batch, dtype=jnp.int32)
    vm = jnp.ones((batch,), jnp.float32)
    # the step donates state: rebind the returned one every call
    for _ in range(warmup):
        state, m = step(state, feats, labels, idx, vm, key)
        float(m["loss"])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, m = step(state, feats, labels, idx, vm, key)
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    return batch / best, state


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    flush("platform", jax.default_backend())

    from multimodal_emotion_detection_tpu.ops import lstm_vjp as V

    # ---- 1+2: big config, epoch-scan, bwd kernel gate A/B (interleaved) --
    state, estep, feats, labels = B._build(
        "logmel_cached", 32, 256, scan=True, big=True)
    for rnd in (1, 2):
        V.set_bwd_kernel_mode("auto")
        cps, state = time_epoch(state, estep, feats, labels, 32, 256)
        flush(f"big_escan_bwdk_auto_r{rnd}_cps", round(cps, 1))
        V.set_bwd_kernel_mode("off")
        cps, state = time_epoch(state, estep, feats, labels, 32, 256)
        flush(f"big_escan_bwdk_off_r{rnd}_cps", round(cps, 1))
    V.set_bwd_kernel_mode("auto")

    # per-step variant (dispatch overhead visible)
    state_s, step_s, feats_s, labels_s = B._build(
        "logmel_cached", 32, 256, scan=False, big=True)
    cps_s, state_s = time_step(state_s, step_s, feats_s, labels_s, 32)
    flush("big_step_cps", round(cps_s, 1))

    # ---- 4: fwd-only share (jit loss eval on the same params) ----------
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )

    cfg = B._bench_config("logmel_cached", 32, "float32", big=True)
    model = classifier_from_config(cfg)
    fb = {m: a[:32] for m, a in feats_s.items()}
    vm = jnp.ones((32, 2), jnp.float32)

    @jax.jit
    def fwd(params, fb):
        logits = model.apply(
            {"params": params}, fb, vm, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)})
        return logits.sum()

    for _ in range(3):
        float(fwd(state_s.params, fb))
    best = float("inf")
    for _ in range(20):
        t0 = time.perf_counter()
        float(fwd(state_s.params, fb))
        best = min(best, time.perf_counter() - t0)
    flush("big_fwdonly_ms", round(best * 1e3, 3))
    flush("big_step_ms", round(32.0 / RESULTS["big_step_cps"] * 1e3, 3))

    # ---- 3: 2-layer h512 (kernel-eligible) vs 3-layer ------------------
    # same geometry but num_layers=2: the fused residual-native pair
    # qualifies; difference vs 3-layer bounds what a 3-layer fused path
    # could recover.
    import multimodal_emotion_detection_tpu.config as C

    def build_l2(scan):
        cfg2 = B._bench_config("logmel_cached", 32, "float32", big=True)
        C.apply_overrides(cfg2, ["model.encoders.audio.num_layers=2"])
        return _build_from_cfg(cfg2, 32, 256, scan)

    def _build_from_cfg(cfg, batch, n_rows, scan):
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
            make_train_step,
        )

        model = classifier_from_config(cfg)
        rng = np.random.RandomState(0)
        features = {
            "audio": jnp.asarray(rng.randn(n_rows, 48000, 1), jnp.float32),
            "video": jnp.asarray(
                rng.rand(n_rows, 24, 4096).astype(np.float32)),
        }
        lp = logmel_params_from_config(cfg.model.frontend)
        features["audio"] = jax.jit(
            lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
        )(features["audio"])
        labels = jnp.asarray(rng.randint(0, 8, n_rows), jnp.int32)
        tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
        sample = {m: a[:batch] for m, a in features.items()}
        st = create_train_state(
            model, tx, sample, jnp.ones((batch, 2), jnp.float32),
            jax.random.PRNGKey(0))
        mk = make_epoch_train_step if scan else make_train_step
        stp = mk(model, tx, num_modalities=2, modality_dropout=0.1,
                 has_batch_stats=bool(st.model_state))
        return st, stp, features, labels

    st2, estep2, f2, l2 = build_l2(scan=True)
    for rnd in (1, 2):
        V.set_res2_mode("auto")
        cps, st2 = time_epoch(st2, estep2, f2, l2, 32, 256)
        flush(f"l2h512_escan_res2_auto_r{rnd}_cps", round(cps, 1))
        V.set_res2_mode("off")
        cps, st2 = time_epoch(st2, estep2, f2, l2, 32, 256)
        flush(f"l2h512_escan_res2_off_r{rnd}_cps", round(cps, 1))
    V.set_res2_mode("auto")

    print(json.dumps(RESULTS, indent=2))




def extra_bf16():
    """Section 5 (run separately): big config fp32 vs bf16, interleaved."""
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    if OUT.exists():
        RESULTS.update(json.loads(OUT.read_text()))
    flush("platform", jax.default_backend())

    b32 = B._build("logmel_cached", 32, 256, scan=True, big=True,
                   compute_dtype="bfloat16")
    f32 = B._build("logmel_cached", 32, 256, scan=True, big=True)
    sb, eb, fb_, lb = b32
    sf, ef, ff, lf = f32
    for rnd in (1, 2):
        cps, sb = time_epoch(sb, eb, fb_, lb, 32, 256)
        flush(f"big_escan_bf16_r{rnd}_cps", round(cps, 1))
        cps, sf = time_epoch(sf, ef, ff, lf, 32, 256)
        flush(f"big_escan_f32_r{rnd}_cps", round(cps, 1))
    # b256 points for the throughput regime
    bb = B._build("logmel_cached", 256, 256, scan=True, big=True,
                  compute_dtype="bfloat16")
    s2, e2, f2, l2 = bb
    cps, s2 = time_epoch(s2, e2, f2, l2, 256, 256, reps=6)
    flush("big_escan_b256_bf16_cps", round(cps, 1))
    bf = B._build("logmel_cached", 256, 256, scan=True, big=True)
    s3, e3, f3, l3 = bf
    cps, s3 = time_epoch(s3, e3, f3, l3, 256, 256, reps=6)
    flush("big_escan_b256_f32_cps", round(cps, 1))
    print(json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bf16":
        extra_bf16()
    else:
        main()
