"""r3f: post-v2 flagship decomposition — where does the remaining 36% of
attainable go, and which cheap lever moves it?

After the residual-native kernel pair (r3c) the flagship b32 f32 step sits
at MFU 0.301 = 64% of the strict MXU-occupancy ceiling.  The r3a trace is
stale (pre-v2).  This probe re-decomposes the CURRENT production step and
A/Bs the three cheap levers on the table:

  1. rbg hardware PRNG at b32 (headline uses threefry; r2x measured +24%
     on the dropout-heavy transformer — never tried on the flagship)
  2. dropout-free upper bound (model.dropout=0, encoder dropouts=0,
     modality_dropout=0): how much of the step is PRNG + mask math at all
  3. multi-epoch scan (scan-of-scans, ROADMAP bet 3a): does folding E
     epochs into one dispatch beat E chained epoch dispatches when both
     are fetch-synced once at the end?

Plus isolated component times in the v2 regime (audio LSTM auto/off,
FrameEncoder full/dense-only/with-dropout) and a fresh profiler trace of
the production epoch-scan program, parsed op-by-op from trace.json.gz.

All timings min-of-reps, same-process interleaved, fetch-synced (axon
block_until_ready caveat — see bench.py).  Writes r3f_tpu.json
incrementally; trace runs LAST (failure-isolated).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3f_tpu.json")
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


def build_flagship(batch=32, n_rows=256, zero_dropout=False):
    """bench._build('logmel_cached', scan=True) with optional dropout-free
    overrides; returns (state, epoch_step, features, labels)."""
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import log_mel_spectrogram
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_epoch_train_step,
    )

    cfg = B._bench_config("logmel_cached", batch)
    if zero_dropout:
        cfg.model.dropout = 0.0
        for enc in cfg.model.encoders.values():
            enc["dropout"] = 0.0
    model = classifier_from_config(cfg)

    rng = np.random.RandomState(0)
    features = {
        "audio": jnp.asarray(rng.randn(n_rows, 48000, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(n_rows, 24, 4096).astype(np.float32)),
    }
    labels = jnp.asarray(rng.randint(0, 8, n_rows), jnp.int32)
    lp = logmel_params_from_config(cfg.model.frontend)
    features["audio"] = jax.jit(
        lambda w: log_mel_spectrogram(w, lp, use_pallas=True)
    )(features["audio"])

    tx, _ = build_optimizer(cfg.training, steps_per_epoch=36)
    sample = {m: a[:batch] for m, a in features.items()}
    state = create_train_state(
        model, tx, sample, jnp.ones((batch, 2), jnp.float32),
        jax.random.PRNGKey(0),
    )
    step = make_epoch_train_step(
        model, tx, num_modalities=2,
        modality_dropout=0.0 if zero_dropout else 0.1,
        has_batch_stats=bool(state.model_state),
    )
    return state, step, features, labels, cfg, model, tx


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    watchdog()
    flush("platform", jax.default_backend())

    # ---------- lever A/Bs on the production epoch-scan program ----------
    st_base, ep_base, feats, labels, cfg, model, tx = build_flagship()
    st_nod, ep_nod, feats_n, labels_n, *_ = build_flagship(zero_dropout=True)

    def time_escan(state, estep, f, l, prng=None):
        if prng is not None:
            jax.config.update("jax_default_prng_impl", prng)
        try:
            cps, st = B._time_epoch_scan(state, estep, f, l, 32, 256,
                                         warmup=2, iters=8)
        finally:
            if prng is not None:
                jax.config.update("jax_default_prng_impl", "threefry2x32")
        return cps, st

    for rnd in (1, 2):
        cps, st_base = time_escan(st_base, ep_base, feats, labels)
        flush(f"escan_b32_threefry_r{rnd}_cps", round(cps, 1))
        cps, st_base = time_escan(st_base, ep_base, feats, labels, prng="rbg")
        flush(f"escan_b32_rbg_r{rnd}_cps", round(cps, 1))
        cps, st_nod = time_escan(st_nod, ep_nod, feats_n, labels_n)
        flush(f"escan_b32_nodropout_r{rnd}_cps", round(cps, 1))

    # ---------- multi-epoch scan: E=4 in one dispatch vs 4 chained ----------
    from multimodal_emotion_detection_tpu.training.steps import (
        _make_train_step_body,
        scan_over_epoch,
    )

    step_body = _make_train_step_body(
        model, tx, num_modalities=2, modality_dropout=0.1,
        has_batch_stats=bool(st_base.model_state),
    )
    epoch_fn = scan_over_epoch(step_body)

    E, S, Bsz, n_rows = 4, 8, 32, 256

    @jax.jit
    def multi_epoch(state, f, l, mats, vmats, key):
        def body(st, xs):
            m, v = xs
            st2, mets = epoch_fn(st, f, l, m, v, key)
            return st2, mets["loss"][-1]

        return jax.lax.scan(body, state, (mats, vmats))

    single_epoch = jax.jit(epoch_fn)

    mats = jnp.asarray(
        (np.arange(E * S * Bsz).reshape(E, S, Bsz)) % n_rows, jnp.int32)
    vmats = jnp.ones((E, S, Bsz), jnp.float32)
    key = jax.random.PRNGKey(0)

    def leg_multi(st):
        st, losses = multi_epoch(st, feats, labels, mats, vmats, key)
        float(losses[-1])
        return st

    def leg_chained(st):
        last = None
        for e in range(E):
            st, mets = single_epoch(st, feats, labels, mats[e], vmats[e], key)
            last = mets["loss"][-1]
        float(last)
        return st

    sm = st_base
    sc = st_base
    sm = leg_multi(sm)          # compile + warm
    sc = leg_chained(sc)
    for rnd in (1, 2):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            sm = leg_multi(sm)
            best = min(best, time.perf_counter() - t0)
        flush(f"multi4_onedispatch_r{rnd}_cps", round(E * S * Bsz / best, 1))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            sc = leg_chained(sc)
            best = min(best, time.perf_counter() - t0)
        flush(f"multi4_chained_r{rnd}_cps", round(E * S * Bsz / best, 1))

    # ---------- isolated components in the v2 regime ----------
    from multimodal_emotion_detection_tpu.models.encoders import (
        FrameEncoder,
        SequenceEncoder,
    )
    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    rng = np.random.RandomState(0)
    xa = jnp.asarray(rng.randn(32, 372, 64), jnp.float32)
    xv = jnp.asarray(rng.rand(32, 24, 4096), jnp.float32)

    from benchmarks.r3a_tpu import chained_ms

    enc_a = SequenceEncoder(input_dim=64, hidden_dim=256, output_dim=128,
                            num_layers=2, encoder_type="lstm",
                            inference_kernel=False)
    va = jax.jit(lambda k: enc_a.init(k, xa))(jax.random.PRNGKey(0))
    grad_a = jax.grad(
        lambda v, x: jnp.sum(enc_a.apply(v, x, deterministic=True)), argnums=1)
    for mode in ("auto", "off"):
        lv.set_res2_mode(mode)
        lv.set_fwd_kernel_mode(mode)
        lv.set_bwd_kernel_mode(mode)
        flush(f"audio_fwdbwd_b32_v2_{mode}_ms",
              round(chained_ms(grad_a, va, xa), 4))
    lv.set_res2_mode("auto")
    lv.set_fwd_kernel_mode("auto")
    lv.set_bwd_kernel_mode("auto")

    enc_v = FrameEncoder(frame_dim=4096, hidden_dim=256, output_dim=128)
    vv = jax.jit(lambda k: enc_v.init(k, xv))(jax.random.PRNGKey(0))
    grad_v_det = jax.grad(
        lambda v, x: jnp.sum(enc_v.apply(v, x, deterministic=True)), argnums=1)
    flush("video_fwdbwd_b32_det_ms", round(chained_ms(grad_v_det, vv, xv), 4))
    dk = jax.random.PRNGKey(1)
    grad_v_drop = jax.grad(
        lambda v, x: jnp.sum(enc_v.apply(
            v, x, deterministic=False, rngs={"dropout": dk})), argnums=1)
    flush("video_fwdbwd_b32_dropout_threefry_ms",
          round(chained_ms(grad_v_drop, vv, xv), 4))
    # dense-only control: the 4096->256 frame MLP matmul alone
    wd = jnp.asarray(rng.randn(4096, 256) * 0.01, jnp.float32)
    grad_dense = jax.grad(
        lambda w, x: jnp.sum(jax.nn.relu(x @ w)), argnums=1)
    flush("video_dense_only_fwdbwd_b32_ms",
          round(chained_ms(grad_dense, wd, xv), 4))

    # ---------- profiler trace of the CURRENT production program ----------
    try:
        key = jax.random.PRNGKey(0)
        S, Bsz = 8, 32
        mats2 = [jnp.asarray(
            (np.arange(S * Bsz).reshape(S, Bsz) + e * S * Bsz) % 256,
            jnp.int32) for e in range(13)]
        vmat = jnp.ones((S, Bsz), jnp.float32)
        st = st_base
        for e in range(3):
            st, m = ep_base(st, feats, labels, mats2[e], vmat, key)
        float(m["loss"][-1])
        jax.profiler.start_trace("/tmp/r3f_trace")
        for e in range(3, 13):
            st, m = ep_base(st, feats, labels, mats2[e], vmat, key)
        float(m["loss"][-1])
        jax.profiler.stop_trace()
        flush("trace", "/tmp/r3f_trace")

        # parse: top ops by total device time across the 10 traced epochs
        paths = glob.glob("/tmp/r3f_trace/plugins/profile/*/*.trace.json.gz")
        with gzip.open(sorted(paths)[-1], "rt") as f:
            trace = json.load(f)
        by_name = defaultdict(float)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                by_name[ev.get("name", "?")] += ev["dur"]
        top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
        # us across 10 epochs x 8 steps -> ms per step
        flush("trace_top_ops_ms_per_step",
              [[n, round(us / 1e3 / 80, 4)] for n, us in top])
    except Exception as e:  # noqa: BLE001
        flush("trace_error", repr(e))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
