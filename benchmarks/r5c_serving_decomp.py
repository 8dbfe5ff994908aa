"""r5c: decompose the b1 serving latency (round-5 verdict item 5).

SERVING.md claims the 0.86 ms b1 forward is frontend-dominated and
recurrence-floored — by assertion.  This probe measures each phase with
the same one-dispatch scan-over-k microbatch methodology bench.py uses
for `serving_b1_latency_ms`, so the numbers decompose the same quantity:

    full       raw 48k waveform -> logmel -> encoders -> head
    frontend   logmel only (Pallas kernel, b1 grid)
    sans_fe    model applied to precomputed (1, 375, 80) logmel
    audio_enc  SequenceEncoder alone on the logmel features
    video_enc  FrameEncoder alone on (1, 24, 4096)
    dispatch   empty-body scan of the same k (per-microbatch floor)

Writes r5c_serving_decomp.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 50


def timed_ms(fn, *args, reps: int = 10) -> float:
    """Best-of-reps ms per microbatch; fn(*args) runs K microbatches in
    one dispatch and returns an array (value-fetch sync)."""
    import numpy as np

    for _ in range(3):
        np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / K


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_emotion_detection_tpu.config import (
        Config,
        apply_overrides,
    )
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.models.encoders import (
        FrameEncoder,
        SequenceEncoder,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import (
        log_mel_spectrogram,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        make_batched_forward_fn,
    )

    out = {"k": K}
    rng = np.random.RandomState(0)
    batch = 1

    def stack_k(a):
        return jnp.broadcast_to(a[None], (K,) + a.shape)

    # --- full model, raw waveform in (bench.py's serving leg) ---
    cfg = Config()
    apply_overrides(cfg, [
        "dataset.batch_size=1",
        "model.encoders.video.input_dim=4096",
        "model.encoders.audio.inference_kernel=true",
    ])
    cfg.model.frontend.audio = "logmel"
    model = classifier_from_config(cfg)
    feats = {
        "audio": jnp.asarray(rng.randn(batch, 48000, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(batch, 24, 4096).astype(np.float32)),
    }
    params = dict(jax.jit(model.init)(jax.random.PRNGKey(0), feats)).pop(
        "params")
    feats_many = {m: stack_k(a) for m, a in feats.items()}
    fwd_many = make_batched_forward_fn(model, 2)
    out["full_ms"] = timed_ms(
        lambda: fwd_many(params, {}, feats_many))

    # --- full model again at K=200: isolates the per-dispatch RTT share
    # (the scan floor below shows ~0.5 ms/microbatch of the K=50 figure is
    # dispatch/transfer on the tunneled chip, not device compute) ---
    feats_many200 = {m: jnp.broadcast_to(a[None], (200,) + a.shape)
                     for m, a in feats.items()}
    out["full_k200_ms"] = timed_ms(
        lambda: fwd_many(params, {}, feats_many200)) * K / 200

    # --- frontend only (Pallas logmel, same in-graph route).  Reduce the
    # (K, 1, 375, 80) mels to one scalar per microbatch BEFORE the fetch:
    # fetching 6 MB over the tunneled link costs ~2 ms/microbatch and
    # swamped the first version of this probe ---
    lp = logmel_params_from_config(cfg.model.frontend)

    @jax.jit
    def frontend_many(wav_many):
        def body(c, w):
            return c, log_mel_spectrogram(w, lp, use_pallas=True).sum()
        _, y = jax.lax.scan(body, 0, wav_many)
        return y

    wav_many = stack_k(feats["audio"])
    out["frontend_ms"] = timed_ms(lambda: frontend_many(wav_many))

    # --- frontend via XLA (is the Pallas b1 grid the right choice?) ---
    @jax.jit
    def frontend_many_xla(wav_many):
        def body(c, w):
            return c, log_mel_spectrogram(w, lp, use_pallas=False).sum()
        _, y = jax.lax.scan(body, 0, wav_many)
        return y

    out["frontend_xla_ms"] = timed_ms(lambda: frontend_many_xla(wav_many))
    mel = jax.jit(
        lambda w: log_mel_spectrogram(w, lp, use_pallas=True))(feats["audio"])

    # --- model sans frontend: precomputed logmel in ---
    cfg2 = Config()
    apply_overrides(cfg2, [
        "dataset.batch_size=1",
        "model.encoders.video.input_dim=4096",
        "model.encoders.audio.inference_kernel=true",
        f"model.encoders.audio.input_dim={mel.shape[-1]}",
    ])
    model2 = classifier_from_config(cfg2)
    feats2 = {"audio": mel, "video": feats["video"]}
    params2 = dict(jax.jit(model2.init)(jax.random.PRNGKey(0), feats2)).pop(
        "params")
    feats2_many = {m: stack_k(a) for m, a in feats2.items()}
    fwd2_many = make_batched_forward_fn(model2, 2)
    out["sans_frontend_ms"] = timed_ms(
        lambda: fwd2_many(params2, {}, feats2_many))

    # --- audio encoder alone on the logmel features ---
    enc = SequenceEncoder(input_dim=mel.shape[-1], hidden_dim=256,
                          output_dim=cfg.model.output_dim,
                          num_layers=2, encoder_type="lstm", dropout=0.0)
    ep = enc.init(jax.random.PRNGKey(0), mel)

    @jax.jit
    def audio_many(ep, mel_many):
        def body(c, x):
            return c, enc.apply(ep, x, deterministic=True)
        _, y = jax.lax.scan(body, 0, mel_many)
        return y

    mel_many = stack_k(mel)
    out["audio_encoder_ms"] = timed_ms(lambda: audio_many(ep, mel_many))

    # --- video encoder alone ---
    venc = FrameEncoder(frame_dim=4096, hidden_dim=256,
                        output_dim=cfg.model.output_dim,
                        temporal_pooling="attention", dropout=0.0)
    vp = venc.init(jax.random.PRNGKey(0), feats["video"])

    @jax.jit
    def video_many(vp, v_many):
        def body(c, x):
            return c, venc.apply(vp, x, deterministic=True)
        _, y = jax.lax.scan(body, 0, v_many)
        return y

    v_many = stack_k(feats["video"])
    out["video_encoder_ms"] = timed_ms(lambda: video_many(vp, v_many))

    # --- per-microbatch dispatch/scan floor (empty body) ---
    @jax.jit
    def empty_many(x_many):
        def body(c, x):
            return c, x[:1, :1, 0] * 2.0
        _, y = jax.lax.scan(body, 0, x_many)
        return y

    out["scan_floor_ms"] = timed_ms(lambda: empty_many(v_many))

    # Net-of-floor device shares: every phase above rides the same
    # scan-over-K dispatch, so the empty-scan floor (dispatch + tunnel
    # RTT, NOT device compute) subtracts out of each.
    floor = out["scan_floor_ms"]
    for k in ("full", "full_k200", "frontend", "frontend_xla",
              "sans_frontend", "audio_encoder", "video_encoder"):
        out[f"{k}_net_ms"] = round(max(out[f"{k}_ms"] - floor, 0.0), 4)
    net_full = max(out["full_net_ms"], 1e-9)
    out["frontend_share_of_full_net"] = round(
        out["frontend_net_ms"] / net_full, 3)
    out["audio_share_of_full_net"] = round(
        out["audio_encoder_net_ms"] / net_full, 3)
    out["video_share_of_full_net"] = round(
        out["video_encoder_net_ms"] / net_full, 3)
    for k in list(out):
        if isinstance(out[k], float):
            out[k] = round(out[k], 4)
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
