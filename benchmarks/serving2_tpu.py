"""serving2: latency-focused serving benchmark + quantized-weights A/B.

The original serving probe (serving_tpu.py) measured throughput; this
one measures what a deployment actually cares about:

  * single-dispatch forward LATENCY (min-of-reps ms) at batch 1/8/32/256
    on the flagship model fed RAW features (the 48k waveform -> Pallas
    log-mel frontend runs in-graph, as in tools/predict.py);
  * the same grid with int8-weight-only params dequantized into bf16
    (utils/quantize.py — the deployed-artifact configuration);
  * logits agreement f32 vs int8-roundtrip (weight-only PTQ noise);
  * MC-dropout (S=8) latency at batch 32.

Timing is min-of-reps with value-fetch sync (tunnel caveat: bench.py
header).  Writes serving2_tpu.json incrementally.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "serving2_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {json.dumps(value)[:200]}", flush=True)


def watchdog(seconds=3000):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def min_ms(fn, reps=30, warmup=3):
    for _ in range(warmup):
        np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


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
    from multimodal_emotion_detection_tpu.training.steps import (
        make_forward_fn,
    )
    from multimodal_emotion_detection_tpu.uncertainty.mc_dropout import (
        mc_dropout_predict,
    )
    from multimodal_emotion_detection_tpu.utils.quantize import (
        quantize_params_for_eval,
        quantize_tree,
    )

    watchdog()
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())

    cfg = Config()
    apply_overrides(cfg, [
        "dataset.batch_size=32",
        "model.encoders.video.input_dim=4096",
    ])
    cfg.model.frontend.audio = "logmel"
    model = classifier_from_config(cfg)

    rng = np.random.RandomState(0)
    feats32 = {
        "audio": jnp.asarray(rng.randn(32, 48000, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(32, 24, 4096).astype(np.float32)),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats32)
    params = dict(variables).pop("params")
    fwd = make_forward_fn(model, 2)

    # weight-only PTQ size story at the flagship scale
    _, stats = quantize_tree(params)
    stats["compression"] = round(
        stats["bytes_f32"] / max(1, stats["bytes_quantized"]), 3)
    flush("quantize_stats", stats)

    params_q16 = quantize_params_for_eval(params, "int8-bf16")
    params_q32 = quantize_params_for_eval(params, "int8")

    # logits agreement: weight-only int8 noise at f32 compute
    l32 = np.asarray(fwd(params, {}, feats32))
    lq = np.asarray(fwd(params_q32, {}, feats32))
    denom = max(1e-6, float(np.mean(np.abs(l32))))
    flush("int8_logits_mean_abs_delta_rel",
          round(float(np.mean(np.abs(l32 - lq))) / denom, 6))
    flush("int8_argmax_agreement",
          round(float((l32.argmax(-1) == lq.argmax(-1)).mean()), 4))

    for b in (1, 8, 32, 256):
        feats = {
            "audio": jnp.asarray(rng.randn(b, 48000, 1), jnp.float32),
            "video": jnp.asarray(rng.rand(b, 24, 4096).astype(np.float32)),
        }
        for tag, p in (("f32", params), ("int8bf16", params_q16)):
            ms = min_ms(lambda: fwd(p, {}, feats),
                        reps=(30 if b <= 32 else 10))
            flush(f"forward_latency_b{b}_{tag}_ms", round(ms, 4))
            flush(f"forward_b{b}_{tag}_clips_per_sec", round(b / ms * 1e3, 1))

    # Device-true steady-state latency: the single-dispatch numbers above
    # are dominated by the tunnel RTT (~25 ms this session — bench.py
    # header caveat), so time K=50 microbatches in ONE dispatch
    # (make_batched_forward_fn) and report ms per forward — the
    # pipelined-serving figure a co-located host would see.
    from multimodal_emotion_detection_tpu.training.steps import (
        make_batched_forward_fn,
    )

    K = 50
    for b in (1, 8, 32):
        feats = {
            "audio": jnp.asarray(rng.randn(b, 48000, 1), jnp.float32),
            "video": jnp.asarray(rng.rand(b, 24, 4096).astype(np.float32)),
        }
        feats_many = {
            m: jnp.broadcast_to(a[None], (K,) + a.shape)
            for m, a in feats.items()
        }
        for tag, p in (("f32", params), ("int8bf16", params_q16)):
            fwd_many = make_batched_forward_fn(model, 2)
            ms = min_ms(lambda: fwd_many(p, {}, feats_many), reps=10)
            flush(f"steady_state_latency_b{b}_{tag}_ms_per_forward",
                  round(ms / K, 4))
            flush(f"steady_state_b{b}_{tag}_clips_per_sec",
                  round(b * K / ms * 1e3, 1))

    # MC-dropout S=8 at b32 (uncertainty serving)
    key = jax.random.PRNGKey(0)

    def mc():
        logits, unc = mc_dropout_predict(
            model, params, {}, feats32, num_samples=8, key=key)
        return unc

    flush("mc_dropout8_b32_latency_ms", round(min_ms(mc, reps=10), 4))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
