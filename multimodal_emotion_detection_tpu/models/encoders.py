"""Per-modality encoders (flax.linen), capability parity with
/root/reference/src/encoders.py, re-designed as pure functional modules.

Inventory (reference file:line in each class docstring):
* SequenceEncoder — lstm / gru / cnn / transformer variants
* FrameEncoder — per-frame MLP + attention/average/max temporal pooling
* SimpleMLPEncoder — [Dense->BN->ReLU->Dropout]*n -> Dense, rank-3 mean-pool
* ImageCNNEncoder — ResNet-18/34-style backbone for (B,H,W,C)/(B,T,H,W,C)
  (the reference's PretrainedCNNEncoder slot; weights random by default
  since there is no network egress — a torchvision state_dict can be
  imported via models.resnet.load_torch_resnet_weights)
* build_encoder — factory with the same config keys + modality heuristics

Every module takes ``deterministic`` for dropout (so MC-dropout is a vmap
over rng keys) and a ``dtype`` for bf16 compute with fp32 params.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_emotion_detection_tpu.models.recurrent import (
    FusedStackedRNN,
    StackedRNN,
)
from multimodal_emotion_detection_tpu.models.resnet import ResNet
from multimodal_emotion_detection_tpu.ops.flash_attention import (
    flash_attention,
)

# Full-step flash-vs-XLA crossover measured on v5e with the production
# train step: the XLA MHA path is faster end-to-end while the
# (B, H, T, T) scores tensor is small — the (0,2,1,3) transposes in/out
# of the Pallas kernel plus lost fusion with neighbouring ops outweigh
# flash's O(T) memory win — and flash wins once the scores XLA must
# materialize (twice: stored probs + backward) get large.  The crossover
# is NOT a pure function of T: at b32 it sits at T>=1024
# (benchmarks/r3q_tpu.json: 0.80/0.82/0.74 flash-vs-xla at 375/512/768,
# 1.07/1.09 at 1024/1536) but at b256 flash already wins at T=375
# (benchmarks/r3r_tpu.json: 1.058; blockwise folded-batch 512 of
# 512-blocks is parity 0.999).  A scores-ELEMENT criterion fits every
# measured point: route to flash at B*H*T^2 >= 32*4*1024^2 (=2^27,
# the b32 crossover; b256@375 = 144M just above it, b32@768 = 75M and
# b256@256 = 67M below).  At/above parity flash is also the safer
# choice: it never materializes the scores, so HBM use stays O(T).
FLASH_AUTO_MIN_SCORES = 32 * 4 * 1024 * 1024

# r3s: fuse the XLA route's three q/k/v projection gemms into one
# (D, 3*H*Dh) einsum (_FusedQKVSelfAttention — same param tree, same
# flax attention core).  Default decided by the full-step interleaved
# A/B on chip (benchmarks/r3s_tpu.json); the setter exists so the probe
# and tests can flip it per-build.
_XLA_FUSED_QKV = False


def set_xla_fused_qkv(on: bool) -> None:
    global _XLA_FUSED_QKV
    _XLA_FUSED_QKV = bool(on)


def flash_auto_routes_to_kernel(
    batch: int, seq_len: int, num_heads: int, interpret: bool = False
) -> bool:
    """Trace-time routing decision for ``use_flash='auto'``.

    'auto' is a performance router, so it only ever picks the kernel on
    the real TPU backend (never the interpret-mode CPU emulation —
    explicit ``use_flash=True`` remains the way to exercise that in
    tests), and only when the full-step measurements say the kernel
    wins: PER-CHIP scores elements B*H*T^2 >= FLASH_AUTO_MIN_SCORES.

    Under GSPMD the trace sees the GLOBAL batch while each chip executes
    batch/ndev, so the estimate divides by ``jax.device_count()``
    assuming a fully data-parallel batch.  That assumption errs toward
    the XLA route (under shard_map the shape is already per-chip, and a
    model-parallel mesh doesn't shard the batch) — deliberately so: the
    measured cost of mis-routing to XLA past the crossover is <=9%
    (r3q/r3r flash wins 1.06-1.09x) while mis-routing to flash below it
    costs 20-35% (r3q XLA wins 1.21-1.35x).
    """
    per_chip_batch = max(1, batch // jax.device_count())
    return (
        jax.default_backend() == "tpu"
        and not interpret
        and (per_chip_batch * num_heads * seq_len * seq_len
             >= FLASH_AUTO_MIN_SCORES)
    )


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = 1):
    """Mean over ``axis`` honouring an optional (B, T) validity mask."""
    if mask is None:
        return x.mean(axis=axis)
    m = mask.astype(x.dtype)[..., None]
    summed = (x * m).sum(axis=axis)
    denom = jnp.clip(m.sum(axis=axis), min=1.0)
    return summed / denom


def masked_max(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = 1):
    if mask is None:
        return x.max(axis=axis)
    very_neg = jnp.finfo(x.dtype).min
    m = mask.astype(bool)[..., None]
    return jnp.where(m, x, very_neg).max(axis=axis)


class AttentionPool(nn.Module):
    """Learned scalar score per frame -> softmax -> weighted sum.

    Reference: FrameEncoder.attention_pool
    (/root/reference/src/encoders.py:300-327).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, frames: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        scores = nn.Dense(1, dtype=self.dtype, name="attention")(frames)[..., 0]
        if mask is not None:
            scores = jnp.where(mask.astype(bool), scores, -1e9)
        weights = jax.nn.softmax(scores, axis=1)  # (B, T)
        return jnp.einsum("bt,bth->bh", weights, frames)


class _QKVProjParams(nn.Module):
    """Parameter container with ``nn.DenseGeneral``'s exact {kernel, bias}
    tree and inits — lets the fused-QKV attention below own q/k/v params
    that are bit-compatible with ``nn.MultiHeadDotProductAttention``'s."""

    in_dim: int
    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self):
        def kernel_init(rng, shape, dtype=jnp.float32):
            # DenseGeneral draws on the FLATTENED (in, H*Dh) shape then
            # reshapes — replicate so init values match it bitwise
            flat = (shape[0], shape[1] * shape[2])
            return nn.linear.default_kernel_init(rng, flat, dtype).reshape(
                shape)

        kernel = self.param(
            "kernel", kernel_init,
            (self.in_dim, self.num_heads, self.head_dim), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (self.num_heads, self.head_dim), jnp.float32)
        return kernel, bias


class _FusedQKVSelfAttention(nn.Module):
    """XLA-path self-attention with ONE fused q/k/v projection gemm.

    Numerically the same computation as ``nn.MultiHeadDotProductAttention``
    (it builds the identical {query,key,value,out}/{kernel,bias} parameter
    tree, draws the same ``make_rng('dropout')`` stream, and calls flax's
    own ``nn.dot_product_attention`` core), but the three (D, H*Dh)
    projection gemms become a single (D, 3*H*Dh) einsum — one MXU dispatch
    with a 3x wider N dimension, which matters in the small-scores regime
    where the XLA route runs (benchmarks/r3s_tpu.json).
    """

    num_heads: int
    qkv_features: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, F)
        mask: Optional[jnp.ndarray] = None,  # broadcastable (B,1,1,T) bool
        deterministic: bool = True,
    ) -> jnp.ndarray:
        in_dim = x.shape[-1]
        head_dim = self.qkv_features // self.num_heads
        proj = functools.partial(
            _QKVProjParams, in_dim=in_dim,
            num_heads=self.num_heads, head_dim=head_dim)
        qk, qb = proj(name="query")()
        kk, kb = proj(name="key")()
        vk, vb = proj(name="value")()
        # (D, 3, H, Dh) / (3, H, Dh): the stack is O(D*H*Dh) bytes per
        # step — negligible next to the gemm it fuses
        w = jnp.stack([qk, kk, vk], axis=1).astype(self.dtype)
        b = jnp.stack([qb, kb, vb], axis=0).astype(self.dtype)
        qkv = jnp.einsum("btd,dchn->btchn", x.astype(self.dtype), w) + b
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        dropout_rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        attn = nn.dot_product_attention(
            q, k, v, mask=mask,
            dropout_rng=dropout_rng, dropout_rate=self.dropout_rate,
            broadcast_dropout=True, deterministic=deterministic,
            dtype=self.dtype)
        return nn.DenseGeneral(
            features=in_dim, axis=(-2, -1), dtype=self.dtype, name="out"
        )(attn)


class _FlashSelfAttention(nn.Module):
    """Self-attention through the Pallas flash kernel (ops/flash_attention).

    The q/k/v/out projections are DenseGeneral with the exact parameter
    tree of ``nn.MultiHeadDotProductAttention`` — a checkpoint trained on
    the XLA path loads on the flash path unchanged (and vice versa); the
    two paths agree to ~1e-5 (tests/test_ops.py).
    """

    num_heads: int
    qkv_features: int
    dtype: jnp.dtype = jnp.float32
    interpret: bool = False  # tests: run the kernel in interpret mode
    dropout_rate: float = 0.0  # in-kernel attention-prob dropout (TPU)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, F)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, T) True=valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        head_dim = self.qkv_features // self.num_heads
        proj = functools.partial(
            nn.DenseGeneral,
            features=(self.num_heads, head_dim),
            axis=-1,
            dtype=self.dtype,
        )
        # (B, T, H, Dh) -> (B, H, T, Dh)
        q = proj(name="query")(x).transpose(0, 2, 1, 3)
        k = proj(name="key")(x).transpose(0, 2, 1, 3)
        v = proj(name="value")(x).transpose(0, 2, 1, 3)
        bias = None
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask.astype(bool), 0.0, -1e9)
        interpret = self.interpret or jax.default_backend() != "tpu"
        rate, seed = 0.0, None
        if self.dropout_rate > 0.0 and not deterministic:
            # fold the flax dropout stream into one int32 kernel seed;
            # the per-block mask derives from (seed, b, h, iq, ik) inside
            # the kernel (ops/flash_attention.py:_attn_dropout_mask)
            rate = self.dropout_rate
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            )
        out = flash_attention(q, k, v, bias, interpret=interpret,
                              dropout_rate=rate, dropout_seed=seed)
        out = out.transpose(0, 2, 1, 3)  # (B, T, H, Dh)
        return nn.DenseGeneral(
            features=x.shape[-1], axis=(-2, -1), dtype=self.dtype, name="out"
        )(out)


class TransformerBlock(nn.Module):
    """Post-LN encoder layer (torch nn.TransformerEncoderLayer semantics:
    x = LN(x + MHA(x)); x = LN(x + GELU-FFN(x))), ref encoders.py:96-113."""

    hidden_dim: int
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # Pallas flash kernel (ops/flash_attention.py): True | False | 'auto'
    # ('auto' routes on the trace-time scores size — see
    # flash_auto_routes_to_kernel)
    use_flash: Any = "auto"
    flash_interpret: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, T) True=valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # Flash runs attention-prob dropout IN-KERNEL on TPU (seeded per
        # block, regenerated in the backward — no (Tq, Tk) mask in HBM).
        # The interpret/CPU path has no Pallas PRNG, so active dropout
        # there falls back to the XLA MHA.  Both paths build the identical
        # "self_attn" parameter tree, so routing is checkpoint-transparent.
        dropout_active = not deterministic and self.dropout > 0.0
        flash_dropout_ok = (
            jax.default_backend() == "tpu" and not self.flash_interpret
        )
        use_flash = self.use_flash
        if isinstance(use_flash, str):
            # reject typos/quoted booleans instead of letting an
            # arbitrary truthy string silently force the kernel
            if use_flash != "auto":
                raise ValueError(
                    f"use_flash must be True, False or 'auto'; got "
                    f"{use_flash!r}")
            # shapes are static under jit: this resolves at trace time
            use_flash = flash_auto_routes_to_kernel(
                x.shape[0], x.shape[1], self.num_heads,
                interpret=self.flash_interpret,
            )
        if use_flash and (not dropout_active or flash_dropout_ok):
            attn_out = _FlashSelfAttention(
                num_heads=self.num_heads,
                qkv_features=self.hidden_dim,
                dtype=self.dtype,
                interpret=self.flash_interpret,
                dropout_rate=self.dropout,
                name="self_attn",
            )(x, key_padding_mask=key_padding_mask,
              deterministic=deterministic)
        else:
            attn_mask = None
            if key_padding_mask is not None:
                # (B, 1, 1, T): broadcast over heads and query positions
                attn_mask = key_padding_mask[:, None, None, :].astype(bool)
            if _XLA_FUSED_QKV:
                attn_out = _FusedQKVSelfAttention(
                    num_heads=self.num_heads,
                    qkv_features=self.hidden_dim,
                    dropout_rate=self.dropout,
                    dtype=self.dtype,
                    name="self_attn",
                )(x, mask=attn_mask, deterministic=deterministic)
            else:
                attn_out = nn.MultiHeadDotProductAttention(
                    num_heads=self.num_heads,
                    qkv_features=self.hidden_dim,
                    dropout_rate=self.dropout,
                    deterministic=deterministic,
                    dtype=self.dtype,
                    name="self_attn",
                )(x, x, mask=attn_mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x + attn_out)
        h = nn.Dense(self.hidden_dim * 4, dtype=self.dtype, name="ffn_in")(x)
        h = nn.gelu(h, approximate=False)  # torch F.gelu is the exact erf form
        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ffn_out")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x + h)


class SequenceEncoder(nn.Module):
    """Time-series -> fixed embedding; 4 variants, ref encoders.py:15-192.

    * lstm/gru: StackedRNN (scan) -> last hidden -> Dense projection
    * cnn: Conv(k5)->BN->ReLU->Drop->Conv(k3)->BN->ReLU->global-avg-pool
      ->Drop->Dense (ref :79-94,157-168)
    * transformer: Dense in-proj + learned pos-emb (max_len 4096) -> N
      post-LN blocks -> masked mean-pool -> Dense (ref :96-113,170-192)
    """

    input_dim: int
    hidden_dim: int = 256
    output_dim: int = 128
    num_layers: int = 2
    encoder_type: str = "lstm"
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    scan_unroll: int = 4  # tuned on v5e (benchmarks/tpu_tuning.json)
    fused: bool = True  # all-layers-in-one-scan for short sequences
    # Default-on since round 2: wins at every measured shape on v5e
    # (benchmarks/flash_attention_tpu.json, serving_tpu.json); both fall
    # back automatically when the shape/backend doesn't qualify, and
    # training falls back to XLA MHA while attention dropout is active.
    inference_kernel: bool = True  # Pallas in-kernel recurrence at eval
    max_len: int = 4096
    attention_block: int = 512  # local-attention block size past max_len
    # Pallas flash attention in transformer blocks: True | False | 'auto'
    # ('auto', the default, routes per trace-time scores size — XLA MHA
    # when B*H*T^2 is small, the flash kernel once it is large; see
    # flash_auto_routes_to_kernel, benchmarks/r3q+r3r_tpu.json)
    use_flash: Any = "auto"
    flash_interpret: bool = False

    @nn.compact
    def __call__(
        self,
        sequence: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        bn_eval: Optional[bool] = None,
    ) -> jnp.ndarray:
        # bn_eval decouples BatchNorm stats mode from dropout so MC-dropout
        # can keep BN in eval while sampling dropout (ref uncertainty.py:37-46)
        bn_ra = deterministic if bn_eval is None else bn_eval
        x = sequence.astype(self.dtype)
        if self.encoder_type in ("lstm", "gru"):
            # Variable lengths: the torch path packs sequences; here we scan
            # the full padded length and gather the hidden state at t=len-1
            # per row (same result, static shapes).
            #
            # Short sequences use the fused all-layers-in-one-scan module
            # (identical parameter tree + numerics, about half the scan
            # trips); long sequences need the layerwise chunked-remat path.
            use_fused = (
                self.fused
                and self.num_layers > 1
                and x.shape[1] <= 2048
            )
            if use_fused:
                rnn = FusedStackedRNN(
                    hidden_dim=self.hidden_dim,
                    num_layers=self.num_layers,
                    cell_type=self.encoder_type,
                    dropout=self.dropout if self.num_layers > 1 else 0.0,
                    dtype=self.dtype,
                    unroll=self.scan_unroll,
                    inference_kernel=self.inference_kernel and lengths is None,
                    name="rnn",
                )
            else:
                rnn = StackedRNN(
                    hidden_dim=self.hidden_dim,
                    num_layers=self.num_layers,
                    cell_type=self.encoder_type,
                    dropout=self.dropout if self.num_layers > 1 else 0.0,
                    dtype=self.dtype,
                    unroll=self.scan_unroll,
                    name="rnn",
                )
            if use_fused:
                # lengths=None consumes only the final hidden state; the
                # fused module then routes the LSTM through the dys-free
                # backward (no zero-cotangent stream)
                outputs, h_last = rnn(
                    x, deterministic=deterministic,
                    need_sequence=lengths is not None,
                )
            else:
                outputs, h_last = rnn(x, deterministic=deterministic)
            if lengths is not None:
                idx = jnp.clip(lengths.astype(jnp.int32) - 1, 0, x.shape[1] - 1)
                h_last = jnp.take_along_axis(
                    outputs, idx[:, None, None], axis=1
                )[:, 0, :]
            return nn.Dense(self.output_dim, dtype=self.dtype, name="projection")(
                h_last
            )

        if self.encoder_type == "cnn":
            h = nn.Conv(self.hidden_dim, kernel_size=(5,), padding="SAME",
                        dtype=self.dtype, name="conv1")(x)
            h = nn.BatchNorm(use_running_average=bn_ra, dtype=self.dtype,
                             name="bn1")(h)
            h = nn.relu(h)
            h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
            h = nn.Conv(self.hidden_dim, kernel_size=(3,), padding="SAME",
                        dtype=self.dtype, name="conv2")(h)
            h = nn.BatchNorm(use_running_average=bn_ra, dtype=self.dtype,
                             name="bn2")(h)
            h = nn.relu(h)
            h = h.mean(axis=1)  # AdaptiveAvgPool1d(1)
            h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
            return nn.Dense(self.output_dim, dtype=self.dtype, name="projection")(h)

        if self.encoder_type == "transformer":
            batch, seq_len = x.shape[0], x.shape[1]
            valid = None
            if lengths is not None:
                valid = (
                    jnp.arange(seq_len)[None, :] < lengths[:, None]
                )  # (B, T) True=valid

            # O(T^2) attention is impossible at raw-waveform lengths (the
            # reference would OOM the same way).  Past max_len, attend in
            # local blocks folded into the batch axis — linear in T, fully
            # MXU-parallel — then pool over the whole sequence
            # (SURVEY.md §5 long-context row: "block it into chunks").
            blockwise = seq_len > self.max_len
            if blockwise:
                block = self.attention_block
                pad = (-seq_len) % block
                if valid is None:
                    valid = jnp.ones((batch, seq_len), dtype=bool)
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                valid = jnp.pad(valid, ((0, 0), (0, pad)))
                t_pad = seq_len + pad
                positions = jnp.clip(jnp.arange(t_pad), 0, self.max_len - 1)
            else:
                positions = jnp.clip(jnp.arange(seq_len), 0, self.max_len - 1)

            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_proj")(x)
            pos_emb = nn.Embed(self.max_len, self.hidden_dim, dtype=self.dtype,
                               name="pos_embedding")(positions)
            h = h + pos_emb[None, :, :]

            if blockwise:
                nb = h.shape[1] // self.attention_block
                h = h.reshape(batch * nb, self.attention_block, self.hidden_dim)
                block_valid = valid.reshape(batch * nb, self.attention_block)
                # fully-padded blocks would softmax over nothing: keep one
                # sentinel key valid (their outputs are masked out in pooling)
                block_valid = block_valid.at[:, 0].set(
                    block_valid[:, 0] | ~block_valid.any(axis=1)
                )
            else:
                block_valid = valid

            for i in range(self.num_layers):
                h = TransformerBlock(
                    hidden_dim=self.hidden_dim,
                    num_heads=4,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    use_flash=self.use_flash,
                    flash_interpret=self.flash_interpret,
                    name=f"block_{i}",
                )(h, key_padding_mask=block_valid, deterministic=deterministic)

            if blockwise:
                h = h.reshape(batch, -1, self.hidden_dim)
            pooled = masked_mean(h, valid, axis=1)
            return nn.Dense(self.output_dim, dtype=self.dtype, name="projection")(
                pooled
            )

        raise ValueError(f"Unknown encoder type: {self.encoder_type}")


class FrameEncoder(nn.Module):
    """Per-frame MLP + temporal pooling, ref encoders.py:196-327."""

    frame_dim: int
    hidden_dim: int = 256
    output_dim: int = 128
    temporal_pooling: str = "attention"  # 'attention' | 'average' | 'max'
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        frames: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        bn_eval: Optional[bool] = None,  # no BN here; uniform interface
    ) -> jnp.ndarray:
        del bn_eval
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="frame_mlp")(
            frames.astype(self.dtype)
        )
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)

        if self.temporal_pooling == "attention":
            pooled = AttentionPool(dtype=self.dtype, name="pool")(x, mask)
        elif self.temporal_pooling == "average":
            pooled = masked_mean(x, mask, axis=1)
        elif self.temporal_pooling == "max":
            pooled = masked_max(x, mask, axis=1)
        else:
            raise ValueError(f"Unknown pooling: {self.temporal_pooling}")

        pooled = nn.Dropout(rate=self.dropout)(pooled, deterministic=deterministic)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="proj_ln")(pooled)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="projection")(pooled)


class SimpleMLPEncoder(nn.Module):
    """[Dense->BN->ReLU->Dropout]*n -> Dense, ref encoders.py:330-396.

    Rank-3 inputs are encoded per timestep then mean-pooled over time
    (ref :390-395) — here as one batched matmul instead of a reshape loop.
    """

    input_dim: int
    hidden_dim: int = 256
    output_dim: int = 128
    num_layers: int = 2
    dropout: float = 0.1
    batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        deterministic: bool = True,
        bn_eval: Optional[bool] = None,
    ) -> jnp.ndarray:
        bn_ra = deterministic if bn_eval is None else bn_eval
        x = features.astype(self.dtype)
        temporal = x.ndim == 3
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=bn_ra,
                    dtype=self.dtype,
                    axis=-1,
                    name=f"bn_{i}",
                )(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="out")(x)
        if temporal:
            x = x.mean(axis=1)
        return x


class ImageCNNEncoder(nn.Module):
    """ResNet-backbone image/frame-sequence encoder.

    Capability slot of the reference's PretrainedCNNEncoder
    (/root/reference/src/encoders.py:400-529): accepts (B, H, W, C) or
    (B, T, H, W, C), temporal pooling 'average'/'max'/'attention', then
    Dropout -> LayerNorm -> Dense projection.
    """

    backbone: str = "resnet18"
    output_dim: int = 128
    temporal_pooling: str = "average"
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        frames: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        bn_eval: Optional[bool] = None,
    ) -> jnp.ndarray:
        bn_ra = deterministic if bn_eval is None else bn_eval
        net = ResNet(variant=self.backbone, dtype=self.dtype, name="backbone")
        if frames.ndim == 4:
            feats = net(frames.astype(self.dtype), deterministic=deterministic,
                        bn_eval=bn_ra)
            feats = nn.Dropout(rate=self.dropout)(feats, deterministic=deterministic)
            feats = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="proj_ln")(feats)
            return nn.Dense(self.output_dim, dtype=self.dtype, name="projection")(
                feats
            )
        if frames.ndim == 5:
            b, t = frames.shape[:2]
            flat = frames.reshape((b * t,) + frames.shape[2:]).astype(self.dtype)
            feats = net(flat, deterministic=deterministic,
                        bn_eval=bn_ra).reshape(b, t, -1)
            if self.temporal_pooling == "attention":
                pooled = AttentionPool(dtype=self.dtype, name="pool")(feats, mask)
            elif self.temporal_pooling == "average":
                pooled = masked_mean(feats, mask, axis=1)
            elif self.temporal_pooling == "max":
                pooled = masked_max(feats, mask, axis=1)
            else:
                raise ValueError(f"Unknown pooling: {self.temporal_pooling}")
            pooled = nn.Dropout(rate=self.dropout)(
                pooled, deterministic=deterministic
            )
            pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="proj_ln")(pooled)
            return nn.Dense(self.output_dim, dtype=self.dtype, name="projection")(
                pooled
            )
        raise ValueError(f"Expected rank-4/5 frames, got shape {frames.shape}")


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

_SEQUENCE_MODALITIES = {
    "imu", "mocap", "audio", "accelerometer", "gyro", "magnetometer",
    "imu_hand", "imu_chest", "imu_ankle",
}


def build_encoder(
    modality: str,
    input_dim: int,
    output_dim: int,
    encoder_config: Optional[Dict[str, Any]] = None,
    dtype: jnp.dtype = jnp.float32,
) -> nn.Module:
    """Route a per-modality config dict to an encoder module.

    Mirrors the key handling + modality-name heuristics of
    /root/reference/src/encoders.py:532-636 ('video'/'frames' -> frame,
    audio/imu/... -> sequence, else mlp) with the same default fallbacks
    (hidden_dim defaults to 2*output_dim for frame/sequence, max(output_dim,
    64) for mlp).
    """
    cfg = dict(encoder_config or {})
    enc_type = cfg.pop("type", None)
    in_dim = cfg.pop("input_dim", input_dim)
    # Per-encoder compute dtype override (mixed-precision models: e.g.
    # video/frame encoder in bf16 while the LSTM recurrence stays f32 —
    # the r3f decomposition showed the frame MLP's f32 matmuls are a
    # ~0.6 ms isolated sink at b32).  The classifier casts every encoder
    # output back to the model dtype, so fusion/head are unaffected.
    dt_over = cfg.pop("dtype", None)
    if dt_over is not None:
        dtype = (
            {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dt_over]
            if isinstance(dt_over, str) else dt_over
        )

    if enc_type is None:
        mod = modality.lower()
        if mod in {"video", "frames"}:
            enc_type = "frame"
        elif mod in _SEQUENCE_MODALITIES:
            enc_type = "sequence"
        else:
            enc_type = "mlp"

    if enc_type == "frame":
        hidden = cfg.pop("hidden_dim", None)
        return FrameEncoder(
            frame_dim=in_dim,
            hidden_dim=hidden if hidden is not None else output_dim * 2,
            output_dim=output_dim,
            temporal_pooling=cfg.pop("temporal_pooling", "attention"),
            dropout=cfg.pop("dropout", 0.1),
            dtype=dtype,
            name=f"{modality}_encoder",
        )
    if enc_type == "sequence":
        hidden = cfg.pop("hidden_dim", None)
        return SequenceEncoder(
            input_dim=in_dim,
            hidden_dim=hidden if hidden is not None else output_dim * 2,
            output_dim=output_dim,
            num_layers=cfg.pop("num_layers", 2),
            encoder_type=cfg.pop("encoder_type", "lstm"),
            dropout=cfg.pop("dropout", 0.1),
            scan_unroll=cfg.pop("scan_unroll", 4),
            fused=cfg.pop("fused", True),
            inference_kernel=cfg.pop("inference_kernel", False),
            use_flash=cfg.pop("use_flash", "auto"),
            dtype=dtype,
            name=f"{modality}_encoder",
        )
    if enc_type == "mlp":
        hidden = cfg.pop("hidden_dim", None)
        return SimpleMLPEncoder(
            input_dim=in_dim,
            hidden_dim=hidden if hidden is not None else max(output_dim, 64),
            output_dim=output_dim,
            num_layers=cfg.pop("num_layers", 2),
            dropout=cfg.pop("dropout", 0.1),
            batch_norm=cfg.pop("batch_norm", True),
            dtype=dtype,
            name=f"{modality}_encoder",
        )
    if enc_type == "pretrained_cnn":
        # 'weights_path' is consumed at init time, not module-build time:
        # training/loop.py grafts the local torchvision state_dict into the
        # freshly-initialized params via
        # classifier.load_pretrained_encoder_weights (the zero-egress
        # equivalent of the reference's pretrained=True download at
        # /root/reference/src/encoders.py:424-438).
        cfg.pop("weights_path", None)
        return ImageCNNEncoder(
            backbone=cfg.pop("backbone", "resnet18"),
            output_dim=output_dim,
            temporal_pooling=cfg.pop("temporal_pooling", "average"),
            dropout=cfg.pop("dropout", 0.1),
            dtype=dtype,
            name=f"{modality}_encoder",
        )
    raise ValueError(f"Unknown encoder type '{enc_type}' for modality '{modality}'")
