"""Pallas TPU flash attention (forward + custom-VJP backward).

The transformer encoder variant (ref /root/reference/src/encoders.py:96-113)
is the slowest encoder after the LSTM custom-VJP work
(benchmarks/tpu_ablation.json: 5.57 ms/step vs 3.69 for the LSTM flagship)
because XLA materializes the (B, H, T, T) score tensor in HBM twice per
layer (forward + backward).  This kernel streams K/V blocks through VMEM
with an online softmax so scores never touch HBM:

* forward: one pass, running (m, l, acc) in VMEM scratch across the KV
  grid dimension; writes O and the per-row logsumexp (LSE);
* backward: ONE fused kv-major recompute kernel when the kv-block count
  is small (the common case): dK/dV accumulate in VMEM scratch across the
  q-minor grid dim while per-kv-block dQ partials land in distinct output
  blocks (summed outside) — 5 matmuls per block pair instead of the
  classic 7 (separate dQ pass), which is kept as the fallback for very
  long sequences where the partials would outgrow the saved recompute.
  Either way scores never touch HBM.

Numerics match ``attention_reference`` (plain XLA softmax attention, the
same math flax's ``MultiHeadDotProductAttention`` computes) to ~1e-5 in
f32; masking uses an additive key bias (0 valid / -1e9 masked), the same
convention as models/attention.py.

Row stats (m, l) live lanes-replicated at width 128 in VMEM scratch;
the HBM-resident stats (lse, delta) are stored at width ``_STAT_LANES=8``
— a block equal to the full last dim is a legal Mosaic layout at any
width, and 128-replicated HBM stats measured 25 MB of pure bloat per
array at the flagship shape.

Validated on a real v5e chip (benchmarks/flash_attention_tpu.json),
min-of-3x30 fetch-synced reps: training (fwd+bwd) beats XLA at every
measured shape — 1.08x at the flagship T=375, 1.99x at T=3000, 2.35x at
T=8192.  Forward-only at short T stays XLA's (overhead-dominated regime);
``use_flash`` is opt-in from the encoder (models/encoders.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128  # VMEM scratch stat width
_STAT_LANES = 8  # HBM lse/delta stat width
_NEG_INF = -1e30
_MASKED = -1e9  # additive bias for masked keys (matches models/attention.py)


def attention_reference(
    q: jnp.ndarray,  # (B, H, Tq, D)
    k: jnp.ndarray,  # (B, H, Tk, D)
    v: jnp.ndarray,  # (B, H, Tk, D)
    bias: Optional[jnp.ndarray] = None,  # (B, Tk) additive on keys
) -> jnp.ndarray:
    """Plain XLA softmax attention with the same scale/bias conventions."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    if bias is not None:
        s = s + bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd",
        p,
        v.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(q.dtype)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


# trace-time switch: packed mode unpacks FOUR 8-bit keep masks from each
# 32-bit PRNG word (legacy: one word per mask).  r2w measured in-kernel
# dropout ~parity with the XLA MHA fallback at T=375 because PRNG bit
# generation dominates either way; packing quarters the generated vregs.
# MEASURED NO-WIN on chip (benchmarks/r3k_tpu.json: +3% isolated T=375,
# -4% T=3000, +0.1% full transformer step) — the PRNG cost is evidently
# not vreg-count-bound, and the unpack shifts give back what generation
# saves.  Ships OFF (full-step evidence decides defaults, in both
# directions — same rule as GRU_BWD2/epoch_pregather); the switch keeps
# the lever testable.
_DROPOUT_PACKED = False


def set_dropout_packed(on: bool) -> None:
    """Trace-time A/B switch for the packed dropout PRNG (r3k probe)."""
    global _DROPOUT_PACKED
    _DROPOUT_PACKED = bool(on)


def _packed_threshold(rate: float) -> tuple[int, float]:
    """8-bit drop threshold + exact rescale for the packed mask.

    The keep test is ``byte >= thr`` with ``thr = round(rate * 256)``, so
    the EFFECTIVE drop rate is quantized to thr/256 (granularity 1/256;
    rates below 1/512 quantize to no-op — real dropout rates are 0.1+).
    The rescale uses the actual quantized keep probability, making
    E[mask] == 1 exactly rather than carrying the quantization as a
    systematic scale bias."""
    thr = min(int(round(rate * 256.0)), 255)
    return thr, 256.0 / (256.0 - thr)


def _attn_dropout_mask(seed_ref, rate: float, shape, b, h, iq, ik):
    """Deterministic per-(batch, head, q-block, k-block) keep mask, scaled
    to E[mask] == 1.  Seeding the TPU PRNG with the block coordinates
    makes the mask reproducible across the forward and both backward
    passes (which visit blocks in different grid orders).

    Packed mode (OFF by default — measured no-win, r3k): ONE 32-bit word
    yields FOUR 8-bit masks, stacked along sublanes (the lane dim stays
    full width, so the PRNG materializes ~4x fewer vregs); production
    uses the legacy full-word mask below."""
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic's prng_set_seed_32 takes at most TWO i32 seeds: fold the
    # block coordinates into them (int32 wraparound is fine — the fold
    # only needs to be deterministic and collision-scarce)
    s1 = seed_ref[0] + jnp.int32(iq) * jnp.int32(2654435761 & 0x7FFFFFFF)
    s2 = (
        (jnp.int32(b) * jnp.int32(131071) + jnp.int32(h))
        * jnp.int32(524287)
        + jnp.int32(ik)
    )
    pltpu.prng_seed(s1, s2)
    if not _DROPOUT_PACKED:
        bits = pltpu.prng_random_bits(shape)  # int32
        # uniform over 2^32: P(bits_u32 < rate * 2^32) = rate -> dropped
        threshold = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
        keep = bits.astype(jnp.uint32) >= threshold
        return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))
    rows, cols = shape
    rw = (rows + 3) // 4  # word rows: 4 mask rows per word row
    thr, scale = _packed_threshold(rate)
    u = pltpu.prng_random_bits((rw, cols)).astype(jnp.uint32)
    t8 = jnp.uint32(thr)
    planes = [
        (((u >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)) >= t8)
        .astype(jnp.float32)
        for j in range(4)
    ]
    keep = jnp.concatenate(planes, axis=0)
    if 4 * rw != rows:
        keep = keep[:rows]
    return keep * jnp.float32(scale)


def _fwd_kernel(
    q_ref, k_ref, v_ref, b_ref, seed_ref,  # ins (seed: SMEM (1,) int32)
    o_ref, lse_ref,  # outs
    m_scr, l_scr, acc_scr,  # VMEM scratch, persistent across the kv grid dim
    *, scale: float, nk: int, dropout_rate: float = 0.0,
):
    from jax.experimental import pallas as pl

    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    # matmul operands stay in the input dtype (bf16 feeds the MXU
    # natively; casting refs to f32 first measured ~5x slower in bf16);
    # accumulation and all softmax math are f32
    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (bk, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk) f32
    s = s + b_ref[0].astype(jnp.float32)  # (1, bk) broadcasts over rows

    m_prev = m_scr[...]  # (bq, 128) lanes-replicated
    m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # (bq, 1)
    p = jnp.exp(s - m_next[:, :1])  # (bq, bk)
    l_next = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = m_next
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
    v = v_ref[0, 0]
    if dropout_rate > 0.0:
        # torch semantics: softmax -> dropout -> @V.  The normalizer l
        # comes from the UNdropped probs (softmax happened first); only
        # the numerator stream is masked+rescaled.
        p = p * _attn_dropout_mask(
            seed_ref, dropout_rate, p.shape,
            pl.program_id(0), pl.program_id(1), pl.program_id(2), ik,
        )
    acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0, 0] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[...] + jnp.log(l_scr[...]))[:, :_STAT_LANES]


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, b_ref, seed_ref, do_ref, lse_ref, delta_ref,  # ins
    dq_ref,  # out
    dq_scr,  # scratch
    *, scale: float, nk: int, dropout_rate: float = 0.0,
):
    from jax.experimental import pallas as pl

    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + b_ref[0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, :1])  # (bq, bk) f32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    if dropout_rate > 0.0:
        # dS = P o (M~ o dP~ - D): same mask as the forward (same seed
        # coordinates); D = rowsum(dO o O) is dropout-invariant (see
        # _bwd_kv_major)
        dp = dp * _attn_dropout_mask(
            seed_ref, dropout_rate, dp.shape,
            pl.program_id(0), pl.program_id(1), pl.program_id(2), ik,
        )
    ds = p * (dp - delta_ref[0, 0][:, :1]) * scale
    dq_scr[...] = dq_scr[...] + jnp.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, b_ref, seed_ref, do_ref, lse_ref, delta_ref,  # ins
    dk_ref, dv_ref,  # outs
    dk_scr, dv_scr,  # scratch
    *, scale: float, nq: int, dropout_rate: float = 0.0,
):
    _bwd_kv_major(q_ref, k_ref, v_ref, b_ref, seed_ref, do_ref, lse_ref,
                  delta_ref, None, dk_ref, dv_ref, dk_scr, dv_scr,
                  scale=scale, nq=nq, dropout_rate=dropout_rate)


def _bwd_fused_kernel(
    q_ref, k_ref, v_ref, b_ref, seed_ref, do_ref, lse_ref, delta_ref,  # ins
    dqp_ref, dk_ref, dv_ref,  # outs (dqp: per-kv-block dQ partials)
    dk_scr, dv_scr,  # scratch
    *, scale: float, nq: int, dropout_rate: float = 0.0,
):
    _bwd_kv_major(q_ref, k_ref, v_ref, b_ref, seed_ref, do_ref, lse_ref,
                  delta_ref, dqp_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                  scale=scale, nq=nq, dropout_rate=dropout_rate)


def _bwd_kv_major(
    q_ref, k_ref, v_ref, b_ref, seed_ref, do_ref, lse_ref, delta_ref,
    dqp_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale: float, nq: int, dropout_rate: float = 0.0,
):
    """KV-major backward: grid (B, H, nk, nq).  Recomputes (s, p, ds) once
    per (kv, q) block pair; always accumulates dK/dV across the q-minor
    dim.  With ``dqp_ref`` (fused mode) it also writes this kv-block's dQ
    contribution ``ds @ K`` to a distinct (ik, iq) output block — each grid
    point owns one block, so no cross-step accumulation is needed; the
    caller sums the nk partials.  This halves the score recomputation vs a
    separate dQ pass (5 matmuls/block pair instead of 7)."""
    from jax.experimental import pallas as pl

    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (bk, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]  # (bq, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + b_ref[0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, :1])  # (bq, bk) f32
    if dropout_rate > 0.0:
        # kv-major grid is (B, H, nk, nq): program_id(2) is the K block,
        # program_id(3) the Q block — seed in (b, h, iq, ik) order to
        # reproduce the forward's mask exactly.
        # Math: with P~ = P o M~ (M~ = keep/(1-rate)), O = P~ V:
        #   dV = P~^T dO;  dP~ = dO V^T;  dP = M~ o dP~;
        #   dS = P o (dP - D) where D = rowsum(dP o P)
        #       = rowsum(dP~ o P~) = rowsum(dO o O)  -- unchanged.
        mask = _attn_dropout_mask(
            seed_ref, dropout_rate, p.shape,
            pl.program_id(0), pl.program_id(1), pl.program_id(3),
            pl.program_id(2),
        )
        p_drop = p * mask
    else:
        mask = None
        p_drop = p
    # dV += P~^T @ dO ; contract the query dim of both
    dv_scr[...] = dv_scr[...] + jax.lax.dot_general(
        p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if mask is not None:
        dp = dp * mask
    ds = p * (dp - delta_ref[0, 0][:, :1]) * scale  # (bq, bk)
    # dK += dS^T @ Q
    dk_scr[...] = dk_scr[...] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dqp_ref is not None:
        # block (1, 1, 1, bq, d) of the (nk, B, H, Tq, D) partials array
        dqp_ref[0, 0, 0] = jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        ).astype(dqp_ref.dtype)

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing (operates on pre-padded, block-aligned shapes)
# ---------------------------------------------------------------------------


def _specs(block_q, block_k, d, kv_minor):
    """BlockSpecs for (q, k, v, bias[, do, lse, delta]) on grid
    (B, H, major, minor).  ``kv_minor=True`` puts k/v on the minor
    (sequential) grid dim (forward / dQ); False puts q there (dK/dV)."""
    from jax.experimental import pallas as pl

    mi = (lambda b, h, i, j: (b, h, j, 0)) if kv_minor else (
        lambda b, h, i, j: (b, h, i, 0))
    ma = (lambda b, h, i, j: (b, h, i, 0)) if kv_minor else (
        lambda b, h, i, j: (b, h, j, 0))
    q_spec = pl.BlockSpec((1, 1, block_q, d), ma)
    kv_spec = pl.BlockSpec((1, 1, block_k, d), mi)
    # bias travels as (B, 1, Tk): a (1, 1, block_k) block satisfies Mosaic's
    # sublane rule (block dim == full array dim), which (1, block_k) on a
    # (B, Tk) array does not
    bias_spec = pl.BlockSpec(
        (1, 1, block_k), (lambda b, h, i, j: (b, 0, j)) if kv_minor else (
            lambda b, h, i, j: (b, 0, i)))
    row_spec = pl.BlockSpec((1, 1, block_q, _STAT_LANES), ma)  # lse/delta
    return q_spec, kv_spec, bias_spec, row_spec


def _seed_spec():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _flash_fwd_call(q, k, v, bias, seed, block_q, block_k, scale, interpret,
                    dropout_rate=0.0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, heads, tq, d = q.shape
    tk = k.shape[2]
    nq, nk = tq // block_q, tk // block_k
    q_spec, kv_spec, bias_spec, row_spec = _specs(block_q, block_k, d, True)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nk=nk,
                          dropout_rate=dropout_rate),
        grid=(batch, heads, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, _seed_spec()],
        out_specs=[q_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, heads, tq, _STAT_LANES),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias, seed)
    return out, lse


# Fused backward writes per-kv-block dQ partials: (nk, B, H, Tq, D) extra
# HBM.  Past this many kv blocks the partials outgrow the saved recompute,
# so fall back to the classic separate dQ pass (O(T) HBM).
_FUSE_MAX_NK = 8


def _flash_bwd_call(q, k, v, bias, seed, do, lse, delta, block_q, block_k,
                    scale, interpret, dropout_rate=0.0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, heads, tq, d = q.shape
    tk = k.shape[2]
    nq, nk = tq // block_q, tk // block_k
    sem = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
    )
    kv_scratch = [
        pltpu.VMEM((block_k, d), jnp.float32),
        pltpu.VMEM((block_k, d), jnp.float32),
    ]
    q_spec, kv_spec, bias_spec, row_spec = _specs(block_q, block_k, d, False)
    in_specs = [q_spec, kv_spec, kv_spec, bias_spec, _seed_spec(), q_spec,
                row_spec, row_spec]

    if nk <= _FUSE_MAX_NK:
        # one recompute pass: dK/dV accumulate in scratch, dQ partials land
        # in per-(ik, iq) blocks and are reduced outside (nk is small)
        dqp_spec = pl.BlockSpec(
            (1, 1, 1, block_q, d), lambda b, h, i, j: (i, b, h, j, 0)
        )
        dqp, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, scale=scale, nq=nq,
                              dropout_rate=dropout_rate),
            grid=(batch, heads, nk, nq),
            in_specs=in_specs,
            out_specs=[dqp_spec, kv_spec, kv_spec],
            out_shape=[
                jax.ShapeDtypeStruct((nk,) + q.shape, jnp.float32),
                jax.ShapeDtypeStruct(k.shape, k.dtype),
                jax.ShapeDtypeStruct(v.shape, v.dtype),
            ],
            scratch_shapes=kv_scratch,
            compiler_params=sem,
            interpret=interpret,
        )(q, k, v, bias, seed, do, lse, delta)
        return dqp.sum(axis=0).astype(q.dtype), dk, dv

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq,
                          dropout_rate=dropout_rate),
        grid=(batch, heads, nk, nq),
        in_specs=in_specs,
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=kv_scratch,
        compiler_params=sem,
        interpret=interpret,
    )(q, k, v, bias, seed, do, lse, delta)

    q_spec, kv_spec, bias_spec, row_spec = _specs(block_q, block_k, d, True)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk,
                          dropout_rate=dropout_rate),
        grid=(batch, heads, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, _seed_spec(), q_spec,
                  row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=sem,
        interpret=interpret,
    )(q, k, v, bias, seed, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp over block-aligned shapes
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_aligned(q, k, v, bias, seed, block_q, block_k, scale, interpret,
                   dropout_rate):
    out, _ = _flash_fwd_call(q, k, v, bias, seed, block_q, block_k, scale,
                             interpret, dropout_rate)
    return out


def _flash_aligned_fwd(q, k, v, bias, seed, block_q, block_k, scale,
                       interpret, dropout_rate):
    out, lse = _flash_fwd_call(q, k, v, bias, seed, block_q, block_k, scale,
                               interpret, dropout_rate)
    return out, (q, k, v, bias, seed, out, lse)


def _flash_aligned_bwd(block_q, block_k, scale, interpret, dropout_rate,
                       res, do):
    q, k, v, bias, seed, out, lse = res
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    delta = jnp.broadcast_to(delta, delta.shape[:-1] + (_STAT_LANES,))
    dq, dk, dv = _flash_bwd_call(q, k, v, bias, seed, do, lse, delta,
                                 block_q, block_k, scale, interpret,
                                 dropout_rate)
    # int32 seed: tangent space is float0
    dseed = np.empty(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias), dseed


_flash_aligned.defvjp(_flash_aligned_fwd, _flash_aligned_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,  # (B, H, Tq, D)
    k: jnp.ndarray,  # (B, H, Tk, D)
    v: jnp.ndarray,  # (B, H, Tk, D)
    bias: Optional[jnp.ndarray] = None,  # (B, Tk): 0 valid / -1e9 masked
    *,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # int32 scalar/(1,)
) -> jnp.ndarray:
    """Differentiable flash self/cross attention; O(T) HBM, scores in VMEM.

    Handles arbitrary Tq/Tk by zero-padding to block alignment (padded keys
    are bias-masked; padded query rows are sliced away).  The head dim is
    never padded or blocked — a block equal to the full array dim is a
    legal Mosaic layout at any width, and padding D costs real MXU FLOPs
    (measured 1.5x slower at D=64 padded to 128).  Scale is 1/sqrt(D), the
    flax/torch convention.

    Default 512-blocks: at the flagship shape (T=375) the whole sequence is
    a single block, so the grid is (B, H) with no online-softmax overhead;
    long sequences stream in 512-key chunks (s block = 1 MB VMEM).

    ``dropout_rate``/``dropout_seed`` apply torch-semantics attention
    dropout (softmax -> mask+rescale -> @V; ref encoders.py:102-107's
    TransformerEncoderLayer) INSIDE the kernel: the keep mask is generated
    by the TPU PRNG seeded with (seed, batch, head, q-block, k-block), so
    the backward regenerates it exactly without materializing (Tq, Tk)
    masks in HBM.  TPU-only (the interpret path has no PRNG primitive);
    the RNG stream differs from flax's threefry by design — dropout is
    i.i.d. noise, not a numerics contract.
    """
    batch, heads, tq, d = q.shape
    tk = k.shape[2]
    if min(batch, heads, tq, tk, d) < 1:
        raise ValueError(
            f"flash_attention: empty dimension in q{q.shape} / k{k.shape}"
        )
    if bias is None:
        bias = jnp.zeros((batch, tk), jnp.float32)
    elif bias.shape != (batch, tk):
        raise ValueError(
            f"flash_attention: bias shape {bias.shape} != (batch, Tk) = "
            f"({batch}, {tk})"
        )
    # bias is a mask, not a parameter: the VJP does not compute dbias, so
    # cut the edge explicitly rather than silently emitting zero gradients
    # for a learned additive bias.
    bias = jax.lax.stop_gradient(bias)
    scale = float(1.0 / (d ** 0.5))

    dropout_rate = float(dropout_rate)
    if not 0.0 <= dropout_rate < 1.0:
        raise ValueError(f"dropout_rate {dropout_rate} not in [0, 1)")
    if dropout_rate > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout_rate > 0 requires dropout_seed")
        if interpret:
            raise NotImplementedError(
                "flash attention dropout needs the TPU PRNG; interpret "
                "mode has no lowering for it (use the XLA path on CPU)"
            )
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    else:
        seed = jnp.zeros((1,), jnp.int32)

    # A sequence that fits in one block uses an exact-T block (block ==
    # full array dim is a legal Mosaic layout at any size): no padding, no
    # pad/slice HBM copies — measured fastest end-to-end of the
    # {exact-T, round8, 128-aligned} x {8, 128 stat-lane} matrix on v5e.
    # Longer sequences pad to a multiple of the (8-aligned) block size.
    if tq <= block_q:
        block_q = tq
    if tk <= block_k:
        block_k = tk
    pad_q = (-tq) % block_q
    pad_k = (-tk) % block_k

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    bp = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, pad_k)),
                 constant_values=_MASKED)[:, None, :]

    out = _flash_aligned(qp, kp, vp, bp, seed, block_q, block_k, scale,
                         interpret, dropout_rate)
    return out[:, :, :tq, :]
