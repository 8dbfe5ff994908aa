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


def test_classifier_param_count_exact_vs_init():
    """classifier_param_count must match the REAL model's trainable leaf
    sum exactly, for every bench geometry — it feeds the params term of
    the bandwidth roofline (classifier_train_bytes_per_clip)."""
    import bench
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.utils.flops import (
        classifier_param_count,
    )

    geometries = [
        ("flagship", dict(frontend="logmel_cached", batch=32)),
        ("gru", dict(frontend="logmel_cached", batch=32, encoder="gru")),
        ("transformer", dict(frontend="logmel_cached", batch=32,
                             compute_dtype="bfloat16",
                             encoder="transformer")),
        ("big", dict(frontend="logmel_cached", batch=32, big=True)),
        ("raw", dict(frontend="raw", batch=32)),
    ]
    for name, kw in geometries:
        cfg = bench._bench_config(**kw)
        model = classifier_from_config(cfg)
        fe = cfg.model.frontend
        if kw["frontend"].startswith("logmel"):
            T = 1 + (48000 - fe.n_fft) // fe.hop_length
            d = fe.n_mels
        else:
            T, d = 48000, 1
        feats = {
            "audio": jnp.zeros((2, T, d), jnp.float32),
            "video": jnp.zeros((2, 24, 4096), jnp.float32),
        }
        variables = model.init(jax.random.PRNGKey(0), feats,
                               jnp.ones((2, 2)))
        real = sum(x.size for x in
                   jax.tree_util.tree_leaves(variables["params"]))
        analytic = classifier_param_count(cfg)
        assert analytic == real, (
            f"{name}: analytic {analytic} != real {real} "
            f"(diff {analytic - real})")


def test_train_bytes_per_clip_model():
    """Bandwidth-roofline numerator: floor traffic per clip must (a) have
    params amortize as 1/batch, (b) keep residual traffic
    batch-independent, (c) drop the materialized attention probs once
    flash engages, (d) halve RNN residual traffic in bf16 streams."""
    import bench
    from multimodal_emotion_detection_tpu.utils.flops import (
        classifier_train_bytes_per_clip,
        two_sided_attainable,
    )

    cfg = bench._bench_config("logmel_cached", 32)
    b32 = classifier_train_bytes_per_clip(cfg, 32)
    b256 = classifier_train_bytes_per_clip(cfg, 256)
    assert b32["params_bytes"] == pytest.approx(8 * b256["params_bytes"])
    assert b32["residuals_bytes"] == b256["residuals_bytes"]
    assert b32["features_bytes"] == b256["features_bytes"]
    # bf16 residual streams halve the RNN series traffic (the frame
    # encoder's activations stay at the compute dtype)
    b32_bf = classifier_train_bytes_per_clip(cfg, 32, res_bytes=2)
    fe = cfg.model.frontend
    T = 1 + (48000 - fe.n_fft) // fe.hop_length
    lstm_series_f32 = 2 * 2 * T * (4 * 256 + 256 + 256) * 4
    assert (b32["residuals_bytes"] - b32_bf["residuals_bytes"]
            == pytest.approx(lstm_series_f32 / 2))

    # transformer: XLA MHA at b32 materializes (heads,T,T) probs; flash
    # (engaged at b256 per flash_auto_routes_to_kernel) recomputes them
    tcfg = bench._bench_config("logmel_cached", 32, "bfloat16",
                               encoder="transformer")
    t32 = classifier_train_bytes_per_clip(tcfg, 32)
    t256 = classifier_train_bytes_per_clip(tcfg, 256)
    tfe = tcfg.model.frontend
    Tt = 1 + (48000 - tfe.n_fft) // tfe.hop_length
    probs = 2 * 2 * 4 * Tt * Tt * 2  # 2x(layers=2)(heads=4)T^2 bf16
    assert (t32["residuals_bytes"] - t256["residuals_bytes"]
            == pytest.approx(probs))

    # two-sided ceiling: bandwidth side engages and can flip the bound
    ts = two_sided_attainable(1e9, 0.5, bytes_per_clip=1e9,
                              peak_flops=200e12, hbm_bw=600e9)
    assert ts["bound"] == "bandwidth"
    assert ts["attainable_clips_per_sec"] == pytest.approx(600.0)
    ts2 = two_sided_attainable(1e9, 0.5, bytes_per_clip=1e3,
                               peak_flops=200e12, hbm_bw=600e9)
    assert ts2["bound"] == "compute"
    assert ts2["attainable_mfu"] == pytest.approx(0.5)


def test_bench_leg_ceiling_contract():
    """bench._leg_ceiling emits the fields BENCH_r05 consumers rely on,
    with fraction = achieved_mfu / two-sided attainable."""
    import bench

    peak = 197e12
    c = bench._leg_ceiling(38078.0, "logmel_cached", 32, res_bytes=2,
                           peak=peak, hbm_bw=662.2e9)
    assert set(c) == {"attainable_mfu", "fraction", "bound",
                      "bw_ceiling_clips_per_sec", "bytes_per_clip_floor"}
    assert c["bound"] in ("compute", "bandwidth")
    assert 0 < c["fraction"] <= 1.2  # achieved can't far exceed a ceiling
    assert c["bw_ceiling_clips_per_sec"] > 38078  # floor bytes: bw roof high
    assert bench._leg_ceiling(None, "logmel_cached", 32) is None
