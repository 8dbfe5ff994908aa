"""Analytic FLOPs/step model for the flagship classifier.

Counts *matmul* FLOPs (2 x MAC) — the MXU-relevant work — for every
component on the training path: audio frontend (STFT-as-matmul + mel),
sequence encoders (LSTM/GRU gate matmuls, CNN convs, transformer blocks),
frame/MLP encoders, and the concat head.  Elementwise work (gate
nonlinearities, softmax, norm) is excluded: it rides the VPU and is
HBM-bound, so it belongs to the bandwidth roofline, not the compute one.

Training FLOPs use the standard 3x-forward convention (1x forward + 2x
backward for matmul-dominated graphs).  The optimizer update is O(params)
elementwise and excluded.

This powers the ``mfu`` / ``achieved_tflops`` fields in bench.py — the
roofline accounting that anchors clips/s against the chip's ceiling.
The hot loop this model describes replaces the reference's
/root/reference/src/encoders.py:137-155 (LSTM over the waveform) +
train.py:121-164 (concat head).
"""

from __future__ import annotations

from typing import Any, Dict

# Peak dense matmul throughput per chip, FLOP/s.  JAX's DEFAULT matmul
# precision on TPU multiplies in bf16 (fp32 accumulate), so fp32-parameter
# models still ride the bf16 MXU rate — one peak per platform is the
# honest denominator for both compute dtypes.
PEAK_FLOPS = {
    "tpu_v5e": 197e12,  # TPU v5e (v5 lite): 197 TFLOP/s bf16
    "tpu_v4": 275e12,
    "cpu": 1e11,  # nominal; CPU runs are for correctness, not MFU
}


def device_peak_flops() -> float:
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return PEAK_FLOPS["tpu_v5e"]
    if "v4" in kind:
        return PEAK_FLOPS["tpu_v4"]
    if jax.default_backend() == "cpu":
        return PEAK_FLOPS["cpu"]
    return PEAK_FLOPS["tpu_v5e"]


def logmel_frames(num_samples: int, n_fft: int, hop_length: int) -> int:
    """Frame count of the center-less STFT used by ops/logmel.py."""
    return 1 + (num_samples - n_fft) // hop_length


def _frontend_flops(fe, num_samples: int) -> float:
    """Fused STFT+mel as matmuls: per frame, windowed n_fft samples hit a
    (n_fft, 2*n_bins) DFT basis, then (n_bins, n_mels) mel projection."""
    if fe.audio not in ("logmel", "mfcc"):
        return 0.0
    frames = logmel_frames(num_samples, fe.n_fft, fe.hop_length)
    n_bins = fe.n_fft // 2 + 1
    dft = 2 * fe.n_fft * (2 * n_bins)  # real+imag basis matmul
    mel = 2 * n_bins * fe.n_mels
    per_frame = dft + mel
    if fe.audio == "mfcc":
        per_frame += 2 * fe.n_mels * fe.n_mfcc  # DCT matmul
    return float(frames) * per_frame


def _rnn_flops(T: int, input_dim: int, hidden: int, num_layers: int,
               cell: str) -> float:
    """Gate matmuls: LSTM 4 gates, GRU 3 gates; input + recurrent projections."""
    gates = 4 if cell == "lstm" else 3
    total = 0.0
    d_in = input_dim
    for _ in range(num_layers):
        total += T * 2 * gates * hidden * (d_in + hidden)
        d_in = hidden
    return total


def _transformer_flops(T: int, input_dim: int, hidden: int,
                       num_layers: int) -> float:
    """in-proj + per-block (qkv/out proj, scores, att*V, FFN 4x)."""
    d = hidden
    total = 2 * T * input_dim * d  # input projection
    per_block = (
        2 * T * d * (3 * d)      # qkv projections
        + 2 * T * T * d          # scores QK^T
        + 2 * T * T * d          # attention @ V
        + 2 * T * d * d          # output projection
        + 2 * T * d * (4 * d) * 2  # FFN in+out (dim_feedforward = 4d)
    )
    return total + num_layers * per_block


def _cnn_flops(T: int, input_dim: int, hidden: int) -> float:
    """Conv1d k5 (input->hidden) + Conv1d k3 (hidden->hidden), 'same' pad."""
    return (
        T * 2 * 5 * input_dim * hidden
        + T * 2 * 3 * hidden * hidden
    )


def encoder_forward_flops(enc_cfg: Dict[str, Any], output_dim: int,
                          T: int, input_dim: int) -> float:
    """Per-clip forward matmul FLOPs of one configured encoder."""
    cfg = dict(enc_cfg)
    etype = cfg.get("type", "sequence")
    hidden = cfg.get("hidden_dim") or output_dim * 2
    if etype == "sequence":
        cell = cfg.get("encoder_type", "lstm")
        layers = cfg.get("num_layers", 2)
        if cell in ("lstm", "gru"):
            body = _rnn_flops(T, input_dim, hidden, layers, cell)
        elif cell == "transformer":
            body = _transformer_flops(T, input_dim, hidden, layers)
        elif cell == "cnn":
            body = _cnn_flops(T, input_dim, hidden)
        else:
            raise ValueError(f"Unknown encoder_type {cell!r}")
        return body + 2 * hidden * output_dim  # projection
    if etype == "frame":
        mlp = T * 2 * input_dim * hidden
        att = T * 2 * hidden * 1  # AttentionPool scalar scores
        proj = 2 * hidden * output_dim
        return mlp + att + proj
    if etype == "mlp":
        layers = cfg.get("num_layers", 2)
        total, d_in = 0.0, input_dim
        for _ in range(layers):
            total += 2 * d_in * hidden
            d_in = hidden
        total += 2 * hidden * output_dim
        return T * total if T > 1 else total
    if etype == "pretrained_cnn":
        raise ValueError("pretrained_cnn FLOPs not modeled (use XLA cost "
                         "analysis for conv backbones)")
    raise ValueError(f"Unknown encoder type {etype!r}")


def classifier_flops_per_clip(cfg, audio_samples: int = 48000,
                              video_frames: int = 24) -> Dict[str, float]:
    """Forward/train matmul FLOPs per clip for a Config's flagship model.

    Returns a breakdown dict plus 'forward' and 'train' (= 3x forward for
    everything with parameters; the frontend is parameter-free so its
    backward contributes nothing — and with frontend.cache it amortizes to
    ~0 across an epoch and is excluded entirely).
    """
    fe = cfg.model.frontend
    out_dim = cfg.model.output_dim
    breakdown: Dict[str, float] = {}

    cached = bool(getattr(fe, "cache", False))
    frontend = 0.0 if cached else _frontend_flops(fe, audio_samples)
    if frontend:
        breakdown["frontend"] = frontend

    encoder_total = 0.0
    for name, enc_cfg in dict(cfg.model.encoders).items():
        enc_cfg = dict(enc_cfg)
        if name == "audio":
            if fe.audio == "logmel":
                T = logmel_frames(audio_samples, fe.n_fft, fe.hop_length)
                in_dim = fe.n_mels
            elif fe.audio == "mfcc":
                T = logmel_frames(audio_samples, fe.n_fft, fe.hop_length)
                in_dim = fe.n_mfcc
            else:
                T, in_dim = audio_samples, enc_cfg.get("input_dim", 1)
        elif name == "video":
            T, in_dim = video_frames, enc_cfg.get("input_dim", 4096)
        else:
            T = enc_cfg.get("sequence_length", 1)
            in_dim = enc_cfg.get("input_dim", 64)
        f = encoder_forward_flops(enc_cfg, out_dim, T, in_dim)
        breakdown[f"encoder_{name}"] = f
        encoder_total += f

    n_mod = len(dict(cfg.model.encoders))
    head = (2 * n_mod * out_dim * cfg.model.hidden_dim
            + 2 * cfg.model.hidden_dim * cfg.dataset.num_classes)
    breakdown["head"] = head

    forward = frontend + encoder_total + head
    # frontend has no parameters: backward never revisits it
    train = frontend + 3 * (encoder_total + head)
    return {"forward": forward, "train": train, "breakdown": breakdown}


MXU_TILE_ROWS = 128  # systolic array is 128x128 on v4/v5e

# SequenceEncoder builds TransformerBlock(num_heads=4)
# (models/encoders.py:509); encoder config dicts may override via
# 'num_heads' if that knob is ever plumbed through.
TRANSFORMER_NUM_HEADS = 4

# Measured achievable HBM bandwidth, GB/s — calibrated with the chained
# on-device triad in benchmarks/r5_bw_probe.py (differential timing
# cancels the tunnel RTT), NOT a datasheet number.  Banked:
# benchmarks/r5_bw_probe.json.
HBM_BW_GBS = {
    "tpu_v5e": 662.2,  # measured 2026-08-20 (datasheet 819; ~81%)
    "tpu_v4": 1000.0,  # unmeasured fallback (datasheet 1228)
    "cpu": 20.0,  # nominal
}


def device_hbm_bw() -> float:
    """Achievable HBM bandwidth of device 0, bytes/s."""
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return HBM_BW_GBS["tpu_v5e"] * 1e9
    if "v4" in kind:
        return HBM_BW_GBS["tpu_v4"] * 1e9
    if jax.default_backend() == "cpu":
        return HBM_BW_GBS["cpu"] * 1e9
    return HBM_BW_GBS["tpu_v5e"] * 1e9


def compiled_bytes_accessed(lowered_or_compiled) -> float | None:
    """'bytes accessed' from a compiled program's cost analysis — XLA's
    own post-fusion HBM traffic estimate (fusion internals stay in
    VMEM/registers; only fusion operands/results count).  Accepts a
    jax.stages.Lowered or Compiled.  None if the backend doesn't report.

    Caveats (see benchmarks/r5_bytes_probe.py): loop bodies (lax.scan /
    while) are counted per the backend's convention — verified
    empirically there, and bench.py divides by the clips actually
    processed per dispatch accordingly; Pallas custom calls report their
    operand bytes, which is exactly one HBM round-trip per operand, the
    kernel's true floor.
    """
    obj = lowered_or_compiled
    if hasattr(obj, "compile"):
        obj = obj.compile()
    try:
        ca = obj.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if not ca or "bytes accessed" not in ca:
        return None
    return float(ca["bytes accessed"])


def two_sided_attainable(train_flops_per_clip: float, attainable_mfu_v: float,
                         bytes_per_clip: float | None,
                         peak_flops: float | None = None,
                         hbm_bw: float | None = None) -> Dict[str, Any]:
    """Two-sided roofline ceiling: a step can finish no faster than its
    compute time at the occupancy-adjusted MXU ceiling NOR faster than
    its HBM traffic at the measured bandwidth.

        t_compute = flops / (peak * attainable_mfu)
        t_bw      = bytes / bw
        attainable_clips_per_sec = 1 / max(t_compute, t_bw)

    (compute and DMA overlap on TPU, so max() — the classic roofline —
    not sum).  Returns the ceiling, which side binds, and both times.
    """
    peak = peak_flops if peak_flops is not None else device_peak_flops()
    bw = hbm_bw if hbm_bw is not None else device_hbm_bw()
    t_compute = train_flops_per_clip / (peak * attainable_mfu_v)
    out: Dict[str, Any] = {
        "compute_time_per_clip": t_compute,
        "attainable_mfu_compute": attainable_mfu_v,
    }
    if bytes_per_clip is None:
        out.update({
            "bound": "compute",
            "attainable_clips_per_sec": 1.0 / t_compute,
            "attainable_mfu": attainable_mfu_v,
        })
        return out
    t_bw = bytes_per_clip / bw
    t = max(t_compute, t_bw)
    out.update({
        "bytes_per_clip": bytes_per_clip,
        "bw_time_per_clip": t_bw,
        "bound": "bandwidth" if t_bw > t_compute else "compute",
        "attainable_clips_per_sec": 1.0 / t,
        "attainable_mfu": train_flops_per_clip / (peak * t),
    })
    return out


def _transformer_attn_train_flops(T: int, hidden: int,
                                  num_layers: int) -> float:
    """Training FLOPs of the scores (QK^T) and attention@V matmuls.

    These are the transformer's REDUCED-OCCUPANCY work: per head they
    contract/emit over head_dim = hidden/num_heads lanes (64 at the
    flagship's hidden 256 / 4 heads), so the 128-wide MXU tile runs at
    head_dim/128 — independent of batch, which is why the family's
    throughput is flat-to-anti-scaling in batch (r3u/r3v).
    """
    fwd = num_layers * 4 * T * T * hidden  # scores + AV
    return 3 * fwd  # fwd + 2x bwd (dQ/dK/dV are the same shapes)


def _rnn_serial_train_flops(T: int, hidden: int, num_layers: int,
                            cell: str) -> float:
    """Training matmul FLOPs that are SERIAL in time for one RNN stack.

    Two matmuls per step per layer cannot be batched over T: the forward
    h-side gate projection h_{t-1} @ W_hh ([B,H]x[H,gH]) and the reverse
    walk's cotangent hop dgates_t @ W_hh^T ([B,gH]x[gH,H]).  Everything
    else — x-projections, dW contractions, dx — is hoisted to one
    (T*B)-row matmul (ops/lstm_vjp.py) and counts as batched.
    """
    gates = 4 if cell == "lstm" else 3
    return num_layers * 2 * (T * 2 * gates * hidden * hidden)


def attainable_mfu(cfg, batch: int, audio_samples: int = 48000,
                   video_frames: int = 24,
                   peak_flops: float | None = None) -> Dict[str, float]:
    """Strict compute ceiling for a Config's training step, given MXU
    tile occupancy — the speed-of-light number that says what fraction of
    the chip this model COULD reach, so the achieved MFU has an anchor.

    Model: the 128x128 MXU processes a matmul with M rows at occupancy
    min(1, M/128) (rows pad to the tile).  Serial recurrence matmuls
    (``_rnn_serial_train_flops``) have M = batch and cannot be merged
    across time; every other matmul on the training path runs with
    M = batch*T (or a (T*B)-contraction) and counts as fully occupied.

        attainable_time = serial/(peak*occ) + batched/peak
        attainable_mfu  = train_flops / (peak * attainable_time)

    VPU elementwise work, DMA, and dispatch are ignored entirely: this is
    a strict ceiling, not a prediction.  For non-recurrent encoders the
    serial term is zero and the ceiling is 1.0.
    """
    peak = peak_flops if peak_flops is not None else device_peak_flops()
    fl = classifier_flops_per_clip(cfg, audio_samples, video_frames)
    train = fl["train"]

    fe = cfg.model.frontend
    serial = 0.0
    attn = 0.0  # total attention FLOPs across all transformer encoders
    attn_time_flops = 0.0  # Σ attn_flops_enc / occ_enc (per-encoder occ)
    for name, enc_cfg in dict(cfg.model.encoders).items():
        enc_cfg = dict(enc_cfg)
        if enc_cfg.get("type", "sequence") != "sequence":
            continue
        cell = enc_cfg.get("encoder_type", "lstm")
        if cell not in ("lstm", "gru", "transformer"):
            continue
        if name == "audio" and fe.audio in ("logmel", "mfcc"):
            T = logmel_frames(audio_samples, fe.n_fft, fe.hop_length)
        elif name == "audio":
            T = audio_samples
        elif name == "video":
            T = video_frames
        else:
            T = enc_cfg.get("sequence_length", 1)
        hidden = enc_cfg.get("hidden_dim") or cfg.model.output_dim * 2
        if cell == "transformer":
            f = _transformer_attn_train_flops(
                T, hidden, enc_cfg.get("num_layers", 2))
            heads = enc_cfg.get("num_heads", TRANSFORMER_NUM_HEADS)
            occ_enc = min(1.0, (hidden / heads) / MXU_TILE_ROWS)
            attn += f
            # accumulate per-encoder so mixed transformer dims each carry
            # their own occupancy (round-4 advisor finding)
            attn_time_flops += f / occ_enc
        else:
            serial += _rnn_serial_train_flops(
                T, hidden, enc_cfg.get("num_layers", 2), cell)

    serial = min(serial, train)
    if attn > train - serial and attn > 0:
        attn_time_flops *= (train - serial) / attn
        attn = train - serial
    batched = train - serial - attn
    occ = min(1.0, batch / MXU_TILE_ROWS)
    attainable_time = (
        serial / (peak * occ)
        + attn_time_flops / peak
        + batched / peak
    )  # s/clip
    a_mfu = train / (peak * attainable_time)
    return {
        "train_flops_per_clip": train,
        "serial_flops_per_clip": serial,
        "attn_flops_per_clip": attn,
        "batched_flops_per_clip": batched,
        "serial_occupancy": occ,
        "attn_occupancy": attn / attn_time_flops if attn else 1.0,
        "attainable_clips_per_sec": 1.0 / attainable_time,
        "attainable_mfu": a_mfu,
    }


# Optimizer-driven HBM accesses of each parameter per training step
# (adamw, f32 throughout): weights are read by the forward and again by
# the backward fusions (2R), gradients written then read (1W+1R), both
# moments read and rewritten (2R+2W), updated weights written (1W) —
# 9 four-byte accesses per parameter per step.
ADAM_PARAM_ACCESSES = 9

# SequenceEncoder's learned positional table (models/encoders.py:488)
POS_EMB_MAX_LEN = 4096


def _enc_dims(cfg, name: str, enc_cfg: Dict[str, Any], audio_samples: int,
              video_frames: int) -> tuple:
    """(T, input_dim) an encoder sees under the configured frontend."""
    fe = cfg.model.frontend
    if name == "audio":
        if fe.audio in ("logmel", "mfcc"):
            T = logmel_frames(audio_samples, fe.n_fft, fe.hop_length)
            return T, (fe.n_mels if fe.audio == "logmel" else fe.n_mfcc)
        return audio_samples, enc_cfg.get("input_dim", 1)
    if name == "video":
        return video_frames, enc_cfg.get("input_dim", 4096)
    return enc_cfg.get("sequence_length", 1), enc_cfg.get("input_dim", 64)


def classifier_param_count(cfg) -> int:
    """Exact trainable-parameter count of a Config's flagship classifier
    (concat-head train path) — cross-checked leaf-for-leaf against a real
    ``model.init`` in tests/test_flops.py for every bench geometry.

    Feeds the bandwidth roofline: each parameter costs
    ``ADAM_PARAM_ACCESSES`` HBM accesses per step (f32), amortized over
    the batch.
    """
    out_dim = cfg.model.output_dim
    total = 0
    for name, enc_cfg in dict(cfg.model.encoders).items():
        enc_cfg = dict(enc_cfg)
        etype = enc_cfg.get("type", "sequence")
        hidden = enc_cfg.get("hidden_dim") or out_dim * 2
        _, in_dim = _enc_dims(cfg, name, enc_cfg, 48000, 24)
        if etype == "sequence":
            cell = enc_cfg.get("encoder_type", "lstm")
            layers = enc_cfg.get("num_layers", 2)
            d = in_dim
            if cell in ("lstm", "gru"):
                g = 4 if cell == "lstm" else 3
                nb = 1 if cell == "lstm" else 2  # lstm: b; gru: b_ih+b_hh
                for _ in range(layers):
                    total += g * hidden * (d + hidden) + nb * g * hidden
                    d = hidden
            elif cell == "transformer":
                total += in_dim * hidden + hidden  # input_proj
                total += POS_EMB_MAX_LEN * hidden  # pos_embedding
                per_block = (
                    4 * (hidden * hidden + hidden)   # qkv + out proj
                    + hidden * 4 * hidden + 4 * hidden  # ffn in
                    + 4 * hidden * hidden + hidden      # ffn out
                    + 2 * 2 * hidden                    # 2x LayerNorm
                )
                total += layers * per_block
            elif cell == "cnn":
                total += 5 * in_dim * hidden + hidden   # conv1 k5
                total += 3 * hidden * hidden + hidden   # conv2 k3
                total += 2 * 2 * hidden                 # 2x BatchNorm
            else:
                raise ValueError(f"Unknown encoder_type {cell!r}")
            total += hidden * out_dim + out_dim  # projection
        elif etype == "frame":
            total += in_dim * hidden + hidden    # frame_mlp
            total += hidden + 1                  # AttentionPool scores
            total += 2 * hidden                  # proj_ln
            total += hidden * out_dim + out_dim  # projection
        elif etype == "mlp":
            layers = enc_cfg.get("num_layers", 2)
            d = in_dim
            for _ in range(layers):
                total += d * hidden + hidden + 2 * hidden  # dense + BN
                d = hidden
            total += hidden * out_dim + out_dim
        else:
            raise ValueError(f"Param count not modeled for {etype!r}")
    n_mod = len(dict(cfg.model.encoders))
    total += n_mod * out_dim * cfg.model.hidden_dim + cfg.model.hidden_dim
    total += cfg.model.hidden_dim * cfg.dataset.num_classes
    total += cfg.dataset.num_classes
    return total


def classifier_train_bytes_per_clip(cfg, batch: int,
                                    audio_samples: int = 48000,
                                    video_frames: int = 24,
                                    res_bytes: int | None = None,
                                    param_count: int | None = None,
                                    ) -> Dict[str, Any]:
    """Analytic HBM traffic FLOOR per clip for one training step — the
    numerator of the bandwidth roofline (two_sided_attainable).

    Counts only traffic the step CANNOT avoid (a floor, so the resulting
    ceiling is a true upper bound on clips/s; XLA's post-fusion 'bytes
    accessed' over-counts sliced/gathered operands at full size and is
    rejected as a ceiling source — benchmarks/r5_bytes_probe.json):

    * features: each clip's input rows read once (the in-jit gather
      touches batch rows, not the resident split),
    * residuals: every activation series the backward needs, written by
      the forward and read back by the backward (2x its size).  RNN
      series use the residual-stream dtype (``res_bytes``, bf16 under
      configs/fast.yaml); other activations use the compute dtype.
      Attention probs count only when the XLA MHA path materializes
      them (flash recomputes; see flash_auto_routes_to_kernel),
    * params: ``ADAM_PARAM_ACCESSES`` f32 accesses per parameter,
      amortized over the batch.
    """
    compute_bytes = 2 if "bfloat16" in str(
        getattr(cfg.runtime, "compute_dtype", "float32")) else 4
    if res_bytes is None:
        res_bytes = 2 if "bfloat16" in str(
            getattr(cfg.runtime, "lstm_residual_dtype", "float32")) else (
                compute_bytes)
    fe = cfg.model.frontend
    cached = bool(getattr(fe, "cache", False))

    features = 0.0
    residuals = 0.0
    for name, enc_cfg in dict(cfg.model.encoders).items():
        enc_cfg = dict(enc_cfg)
        etype = enc_cfg.get("type", "sequence")
        hidden = enc_cfg.get("hidden_dim") or cfg.model.output_dim * 2
        T, in_dim = _enc_dims(cfg, name, enc_cfg, audio_samples, video_frames)
        if name == "audio" and cached and fe.audio in ("logmel", "mfcc"):
            features += T * in_dim * 4  # cached f32 feature rows
        elif name == "audio" and fe.audio in ("logmel", "mfcc"):
            features += audio_samples * 4  # raw waveform in, frontend on
            residuals += 2 * T * in_dim * compute_bytes  # mel series
        else:
            features += T * in_dim * 4
        if etype == "sequence":
            cell = enc_cfg.get("encoder_type", "lstm")
            layers = enc_cfg.get("num_layers", 2)
            if cell in ("lstm", "gru"):
                g = 4 if cell == "lstm" else 3
                series_h = g * hidden + hidden  # gates + h per layer
                if cell == "lstm":
                    series_h += hidden          # + c series
                residuals += 2 * layers * T * series_h * res_bytes
            elif cell == "transformer":
                heads = enc_cfg.get("num_heads", TRANSFORMER_NUM_HEADS)
                use_flash = (batch * heads * T * T) >= (32 * 4 * 1024 ** 2)
                # per block: q,k,v + attn-out + 2 LN outs + ffn hidden
                per_block = (3 + 1 + 2) * hidden + 4 * hidden
                residuals += 2 * layers * T * per_block * compute_bytes
                if not use_flash:
                    # XLA MHA materializes the (heads, T, T) probs for bwd
                    residuals += 2 * layers * heads * T * T * compute_bytes
            elif cell == "cnn":
                residuals += 2 * 2 * T * hidden * compute_bytes
        elif etype == "frame":
            residuals += 2 * T * hidden * compute_bytes
        elif etype == "mlp":
            layers = enc_cfg.get("num_layers", 2)
            residuals += 2 * layers * max(T, 1) * hidden * compute_bytes

    p = param_count if param_count is not None else classifier_param_count(cfg)
    params = ADAM_PARAM_ACCESSES * 4.0 * p / batch
    total = features + residuals + params
    return {
        "bytes_per_clip": total,
        "features_bytes": features,
        "residuals_bytes": residuals,
        "params_bytes": params,
        "param_count": p,
        "res_bytes": res_bytes,
        "compute_bytes": compute_bytes,
    }


def mfu(clips_per_sec: float, train_flops_per_clip: float,
        peak_flops: float | None = None) -> Dict[str, float]:
    peak = peak_flops if peak_flops is not None else device_peak_flops()
    achieved = clips_per_sec * train_flops_per_clip
    return {
        "achieved_tflops": achieved / 1e12,
        "mfu": achieved / peak,
        "peak_tflops": peak / 1e12,
    }
