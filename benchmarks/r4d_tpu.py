"""r4d: GRU in-kernel inference recurrence A/B (serving path).

Round-4 verdict item 4: GRU is the fastest training family (46.9k
clips/s) but served through the XLA scan; gru2_infer_pallas ports the
double-buffered VMEM walk to the GRU cell and routes exactly like the
LSTM twin (FusedStackedRNN deterministic path).  This probe A/Bs
kernel-on vs kernel-off on the full serving forward (raw 48k waveform ->
in-graph Pallas log-mel -> model) at b1 and b32, K one-dispatch
microbatches, interleaved, plus a logits-parity check.

Writes r4d_tpu.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4d_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {str(value)[:200]}", flush=True)


def watchdog(seconds=2700):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def build_forward(batch, k):
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
        make_batched_forward_fn,
    )

    cfg = Config()
    apply_overrides(cfg, [
        f"dataset.batch_size={batch}",
        "model.encoders.video.input_dim=4096",
        "model.encoders.audio.encoder_type=gru",
        # build_encoder defaults inference_kernel=False (vmapped ensemble
        # forwards can't lower the manual-DMA kernel); the serving CLI
        # enables it per-encoder, and so does this probe — the 'scan'
        # mode then disables it via set_infer_kernel_enabled
        "model.encoders.audio.inference_kernel=true",
    ])
    cfg.model.frontend.audio = "logmel"
    model = classifier_from_config(cfg)
    rng = np.random.RandomState(0)
    feats = {
        "audio": jnp.asarray(rng.randn(batch, 48000, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(batch, 24, 4096).astype(np.float32)),
    }
    params = dict(jax.jit(model.init)(jax.random.PRNGKey(0), feats)).pop(
        "params")
    feats_many = {m: jnp.broadcast_to(a[None], (k,) + a.shape)
                  for m, a in feats.items()}
    fwd_many = make_batched_forward_fn(model, 2)
    return params, feats_many, fwd_many


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    from multimodal_emotion_detection_tpu.models import recurrent as rec

    watchdog()
    flush("platform", jax.default_backend())

    K = 50
    for batch in (1, 32):
        fns, logits = {}, {}
        for mode in ("scan", "kernel"):
            prev = rec.set_infer_kernel_enabled(mode == "kernel")
            try:
                params, feats_many, fwd = build_forward(batch, K)
                out = np.asarray(fwd(params, {}, feats_many))
                logits[mode] = out
                fns[mode] = (fwd, params, feats_many)
            finally:
                rec.set_infer_kernel_enabled(prev)
        err = float(np.abs(logits["kernel"] - logits["scan"]).max())
        flush(f"b{batch}_logits_max_abs_diff", round(err, 6))

        times = {"scan": [], "kernel": []}
        for rep in range(8):
            for mode in ("scan", "kernel"):
                fwd, params, feats_many = fns[mode]
                t0 = time.perf_counter()
                np.asarray(fwd(params, {}, feats_many))
                times[mode].append(time.perf_counter() - t0)
        for mode in ("scan", "kernel"):
            best = min(times[mode])
            med = sorted(times[mode])[len(times[mode]) // 2]
            flush(f"b{batch}_{mode}_ms_per_forward_best",
                  round(best * 1e3 / K, 4))
            flush(f"b{batch}_{mode}_ms_per_forward_med",
                  round(med * 1e3 / K, 4))
        flush(f"b{batch}_kernel_speedup", round(
            sorted(times["scan"])[4] / sorted(times["kernel"])[4], 4))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
