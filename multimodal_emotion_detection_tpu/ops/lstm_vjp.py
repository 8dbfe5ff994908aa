"""Custom VJPs for fused N-layer LSTM/GRU: hoisted weight gradients.

Why: XLA's automatic reverse scan accumulates every weight gradient
*inside* the sequential loop — ~6 small latency-bound matmuls per step;
measured 4.4 ms backward vs 0.9 ms forward at (B=32, T=375, H=256, L=2) on
v5e (benchmarks/ablation_tpu.json).  The serial part of BPTT is only the
``dgates`` chain; every weight gradient is a big contraction over time
that the MXU should do ONCE:

    dW_hh_l = h_l_series[:-1]^T @ dgates_l_series   (one (H, T*B)x(T*B, 4H))
    dW_ih_l = x_l_series^T      @ dgates_l_series
    db_l    = sum_t dgates_l_t

So the custom backward runs a lean reverse scan that *emits* per-step
dgates for every layer, then hoists all weight-gradient contractions out
of the loop.  Measured effect on the flagship train step: 4764 -> 6724
clips/s/chip (batch 32).

Supports any number of layers and torch-style inter-layer dropout (keep
masks are part of the residuals).  Gradients verified against ``jax.grad``
of the plain scan to float32 tolerance (tests/test_models.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _sig(x):
    return jax.nn.sigmoid(x)


def _cell_fwd(h, c, g):
    i, f, gg, o = jnp.split(g, 4, axis=-1)
    c_new = _sig(f) * c + _sig(i) * jnp.tanh(gg)
    h_new = _sig(o) * jnp.tanh(c_new)
    return h_new, c_new


def _cell_bwd(g, c_prev, dh_t, dc_t):
    """Returns (dgates_pre, dc_prev)."""
    i, f, gg, o = jnp.split(g, 4, axis=-1)
    si, sf, so = _sig(i), _sig(f), _sig(o)
    tg = jnp.tanh(gg)
    c = sf * c_prev + si * tg
    tc = jnp.tanh(c)
    dc = dc_t + dh_t * so * (1.0 - tc * tc)
    dgates = jnp.concatenate([
        dc * tg * si * (1.0 - si),
        dc * c_prev * sf * (1.0 - sf),
        dc * si * (1.0 - tg * tg),
        dh_t * tc * so * (1.0 - so),
    ], axis=-1)
    return dgates, dc * sf


def _fwd_scan(x_tm, keep_tm, params):
    """Time-major forward storing per-layer residual series.

    x_tm: (T, B, D); keep_tm: (T, L-1, B, H).  Residuals per layer l:
    (gates_pre, h_prev, c_prev, layer_input) — layer 0's input series is
    not stored (dW_ih0 contracts with x, which the caller holds).
    """
    t_len, batch, _ = x_tm.shape
    n_layers = len(params)
    h_dim = params[0]["w_hh"].shape[0]
    ih0 = x_tm @ params[0]["w_ih"] + params[0]["b"]  # hoisted (MXU)

    def step(carry, inp):
        ih0_t, keep_t = inp
        new_carry = []
        res = []
        x_l = None
        for layer, p in enumerate(params):
            h, c = carry[layer]
            if layer == 0:
                g = ih0_t + h @ p["w_hh"]
            else:
                g = x_l @ p["w_ih"] + p["b"] + h @ p["w_hh"]
            h_new, c_new = _cell_fwd(h, c, g)
            res.append((g, h, c, x_l if layer > 0 else jnp.zeros((0,))))
            new_carry.append((h_new, c_new))
            x_l = h_new
            if layer < n_layers - 1:
                x_l = x_l * keep_t[layer]
        return tuple(new_carry), (new_carry[-1][0], tuple(res))

    zeros = jnp.zeros((batch, h_dim), x_tm.dtype)
    init = tuple((zeros, zeros) for _ in range(n_layers))
    carry, (ys, res) = jax.lax.scan(step, init, (ih0, keep_tm), unroll=4)
    return carry, ys, res


# Pallas kernel dispatch flags, read at TRACE time: 'auto' uses the
# in-kernel path (ops/lstm_kernel.py) on TPU when the shape qualifies;
# 'interpret' forces it (emulated) for CPU parity tests; 'off' keeps the
# XLA scan.
_BWD_KERNEL_MODE = "auto"
_FWD_KERNEL_MODE = "auto"


def set_bwd_kernel_mode(mode: str) -> str:
    global _BWD_KERNEL_MODE
    prev = _BWD_KERNEL_MODE
    assert mode in ("auto", "off", "interpret")
    _BWD_KERNEL_MODE = mode
    return prev


def set_fwd_kernel_mode(mode: str) -> str:
    global _FWD_KERNEL_MODE
    prev = _FWD_KERNEL_MODE
    assert mode in ("auto", "off", "interpret")
    _FWD_KERNEL_MODE = mode
    return prev


def _fwd_kernel_ok(x_tm, params):
    if _FWD_KERNEL_MODE == "off" or len(params) != 2:
        return False, False
    if "b" not in params[0]:  # GRU params: scan path only
        return False, False
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        fwd_kernel_supported,
    )

    t_len, batch = x_tm.shape[0], x_tm.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    interpret = _FWD_KERNEL_MODE == "interpret"
    on_tpu = jax.default_backend() == "tpu"
    ok = (on_tpu or interpret) and fwd_kernel_supported(
        batch, t_len, h_dim, len(params), allow_large=interpret,
        f32_large=x_tm.dtype == jnp.float32,
    )
    return ok, interpret


_RES2_MODE = "auto"  # 'auto' | 'off' — benchmark A/B toggle
# Residual-stream dtype for the v2 kernel pair, read at TRACE time
# (config: runtime.lstm_residual_dtype).  'bfloat16' halves the dominant
# HBM streams (packed + h_prev/x1 series out of the forward, dg0/dg1 out
# of the backward); compute, carries, finals and the forward OUTPUTS stay
# f32.  Engages only on the final-hidden path (fused_lstm_final): the
# sequence-output path reconstructs ys from h1_prev, which bf16 would
# round — a forward-semantics change, not just a gradient approximation.
_RES2_DTYPE = "float32"  # 'float32' | 'bfloat16'


def set_res2_mode(mode: str) -> str:
    global _RES2_MODE
    prev = _RES2_MODE
    _RES2_MODE = mode
    return prev


def set_res2_dtype(dtype: str) -> str:
    global _RES2_DTYPE
    prev = _RES2_DTYPE
    assert dtype in ("float32", "bfloat16")
    _RES2_DTYPE = dtype
    return prev


# v3 gate rematerialization (config: runtime.lstm_remat_gates, read at
# TRACE time).  'on': the v2 forward stores only [c0p|c1p] (+ the
# h_prev/x series the contractions need anyway) and the backward kernel
# recomputes the gate pre-activations from the streamed series and the
# weights — ~45% less kernel-pair HBM traffic at f32 for three extra
# small dots per reverse step.  Measured SLOWER on chip (r3t: the
# post-v2 reverse walk is serial-latency-bound) — ships off; see
# docs/KERNELS.md "gate rematerialization" for the numerics contract.
_RES2_REMAT = "off"  # 'on' | 'off'


def set_res2_remat(mode: str) -> str:
    global _RES2_REMAT
    prev = _RES2_REMAT
    assert mode in ("on", "off")
    _RES2_REMAT = mode
    return prev


def _res3_ok(x_tm, params, interpret):
    """Gate-remat (v3) engages on top of a qualifying v2 geometry when the
    remat reverse kernel also fits VMEM (the extra weight operands)."""
    if _RES2_REMAT != "on":
        return False
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        bwd_remat_kernel_supported,
    )

    t_len, batch, d_in = x_tm.shape
    h_dim = params[0]["w_hh"].shape[0]
    f32_large = x_tm.dtype == jnp.float32
    return bwd_remat_kernel_supported(
        batch, t_len, h_dim, d_in,
        allow_large=interpret, f32_large=f32_large,
    )


def _res2_ok(x_tm, params, interpret):
    """Use the residual-native (v2) kernel pair when BOTH the fwd residual
    kernel and the fused reverse-chain kernel qualify — the v2 layout has
    no other consumer (the scan/layered fallbacks read the legacy
    structure).  Round-3 lever: removes every residual slice/shift/pad
    copy between forward and backward (benchmarks/r3a_tpu.json: ~0.3 ms of
    the 1.7 ms step was the g0/g1 slice alone)."""
    if _BWD_KERNEL_MODE == "off" or _RES2_MODE == "off":
        return False
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        bwd2_kernel_supported,
        res2_kernel_supported,
    )

    t_len, batch = x_tm.shape[0], x_tm.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    f32_large = x_tm.dtype == jnp.float32
    return res2_kernel_supported(
        batch, t_len, h_dim, allow_large=interpret, f32_large=f32_large
    ) and bwd2_kernel_supported(
        batch, t_len, h_dim, allow_large=interpret, f32_large=f32_large
    )


def _fwd_pallas_res2(x_tm, keep_tm, params, interpret, final_only=False):
    """v2 kernel forward: residuals come out exactly as consumed."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_train_fwd_residuals,
    )

    res_dtype = (
        jnp.bfloat16
        if (final_only and _RES2_DTYPE == "bfloat16")
        else jnp.float32
    )
    remat = _res3_ok(x_tm, params, interpret)
    packed, h0p, h1p, x1, keep_pad, finals, t_pad = (
        lstm2_train_fwd_residuals(
            x_tm, keep_tm[:, 0], params[0], params[1], interpret=interpret,
            res_dtype=res_dtype, store_gates=not remat,
        )
    )
    t_len = x_tm.shape[0]
    # ys(t) = h1_prev(t+1) for t < T-1, ys(T-1) = h1_final; only built when
    # the sequence output is actually consumed (DCE'd on the final-hidden
    # path — and bf16 residuals only engage there, so ys is never built
    # from rounded h1p)
    ys = jnp.concatenate(
        [h1p[1:t_len].astype(finals.dtype), finals[2][None]], axis=0)
    carry = ((finals[0], finals[1]), (finals[2], finals[3]))
    key = "res3" if remat else "res2"
    res = {key: (packed, h0p, h1p, x1, keep_pad, finals)}
    return carry, ys, res


def _bwd_impl_res2(saved, dys, dh_final):
    """Backward for the residual-native path: fused reverse-chain kernel
    over the packed buffer, then unsliced contractions over t_pad (padded
    dgates rows are zero, so pad rows contribute nothing)."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_bwd_chain_padded,
        lstm2_bwd_chain_remat,
    )

    x_tm, keep_tm, params, res, carry = saved
    remat = "res3" in res
    packed, h0p, h1p, x1, keep_pad, finals = res["res3" if remat else "res2"]
    t_len, batch = x_tm.shape[0], x_tm.shape[1]
    t_pad = packed.shape[0]
    interpret = _FWD_KERNEL_MODE == "interpret" or (
        _BWD_KERNEL_MODE == "interpret"
    )

    if dys is not None and t_pad != t_len:
        dys = jnp.pad(dys, ((0, t_pad - t_len), (0, 0), (0, 0)))

    x_pad = x_tm
    if t_pad != t_len:
        x_pad = jnp.pad(x_tm, ((0, t_pad - t_len), (0, 0), (0, 0)))
    # bf16 residual streams: contract bf16 x bf16 on the MXU with f32
    # accumulation (weight grads stay f32).  x is cast to the stream dtype
    # so the dW_ih0 contraction doesn't force a 3-pass mixed-precision dot.
    x_pad = x_pad.astype(packed.dtype)

    if remat:
        dg0, dg1 = lstm2_bwd_chain_remat(
            packed, keep_pad, x_pad, x1, h0p, h1p, dys, dh_final,
            params[0], params[1], t_len, interpret=interpret,
        )
    else:
        dg0, dg1 = lstm2_bwd_chain_padded(
            packed, keep_pad, dys, dh_final,
            params[0]["w_hh"], params[1]["w_hh"], params[1]["w_ih"],
            t_len, interpret=interpret,
        )

    def flat(a):
        return a.reshape(t_pad * batch, -1)

    def contract(a, b):
        return jnp.matmul(flat(a).T, flat(b),
                          preferred_element_type=jnp.float32)

    dparams = (
        {
            "w_ih": contract(x_pad, dg0),
            "w_hh": contract(h0p, dg0),
            "b": dg0.astype(jnp.float32).sum(axis=(0, 1)),
        },
        {
            "w_ih": contract(x1, dg1),
            "w_hh": contract(h1p, dg1),
            "b": dg1.astype(jnp.float32).sum(axis=(0, 1)),
        },
    )
    # d(keep) = d(x1) * h0_new; h0_new(t) = h0_prev(t+1), final from carry.
    # keep is a dropout mask (no grad path in training) — XLA DCEs this.
    dx_l = (dg1 @ params[1]["w_ih"].T)[:t_len]
    h0_new = jnp.concatenate(
        [h0p[1:t_len].astype(finals.dtype), finals[0][None]], axis=0)
    dkeep_tm = (dx_l * h0_new)[:, None]  # (T, 1, B, H)
    dkeep = jnp.transpose(dkeep_tm, (2, 0, 1, 3))
    dx = jnp.swapaxes((dg0 @ params[0]["w_ih"].T)[:t_len], 0, 1)
    return dx, dkeep, dparams


def _fwd_layered_ok(x_tm, params):
    """Per-layer forward kernels: the any-depth / large-H route (the big
    sweep config's LSTM x3 h512 — no other kernel path serves it).
    Engages only where the fused 2-layer kernels do NOT apply."""
    if _FWD_KERNEL_MODE == "off" or "b" not in params[0]:
        return False, False
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        bwd_kernel_supported,
        fwd1_kernel_supported,
    )

    t_len, batch = x_tm.shape[0], x_tm.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    interpret = _FWD_KERNEL_MODE == "interpret"
    on_tpu = jax.default_backend() == "tpu"
    f32_large = x_tm.dtype == jnp.float32
    # require the layered BACKWARD too: a kernel forward whose residuals
    # feed the XLA reverse scan wins nothing (the scan re-streams them)
    ok = (
        (on_tpu or interpret)
        and fwd1_kernel_supported(batch, t_len, h_dim,
                                  allow_large=interpret,
                                  f32_large=f32_large)
        and bwd_kernel_supported(batch, t_len, h_dim,
                                 allow_large=interpret,
                                 f32_large=f32_large)
    )
    return ok, interpret


def _fwd_pallas_layered(x_tm, keep_tm, params, interpret):
    """L sequential single-layer kernel launches; any depth, one w_hh in
    VMEM at a time.  Residuals come out in the scan-path structure
    (g, h_prev, c_prev, x_l series per layer), so the backward dispatch
    (_bwd_dgates -> per-layer reverse kernels) consumes them directly."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm1_train_fwd_pallas,
    )

    t_len = x_tm.shape[0]
    n_layers = len(params)
    x_l = x_tm.astype(jnp.float32)
    res = []
    carry = []
    ys = None
    # bf16 residual streams (runtime.lstm_residual_dtype): g and c_prev
    # are backward-only, so rounding them is the r3g envelope; h_prev
    # stays f32 in-kernel — the next layer's input and ys are exact.
    res_dtype = (jnp.bfloat16 if _RES2_DTYPE == "bfloat16"
                 else jnp.float32)
    for layer, p in enumerate(params):
        ih = x_l @ p["w_ih"].astype(jnp.float32) + p["b"].astype(jnp.float32)
        g_s, hp_s, cp_s, finals = lstm1_train_fwd_pallas(
            ih, p["w_hh"], interpret=interpret, res_dtype=res_dtype)
        h_dim = p["w_hh"].shape[0]
        h_final, c_final = finals[:, :h_dim], finals[:, h_dim:]
        res.append((g_s, hp_s, cp_s,
                    x_l if layer > 0 else jnp.zeros((0,))))
        carry.append((h_final, c_final))
        # h_new(t) = h_prev(t+1) for t < T-1, h_new(T-1) = h_final
        h_new = jnp.concatenate([hp_s[1:], h_final[None]], axis=0)
        if layer < n_layers - 1:
            x_l = h_new * keep_tm[:, layer].astype(jnp.float32)
        else:
            ys = h_new
    return tuple(carry), ys, tuple(res)


def _fwd_pallas(x_tm, keep_tm, params, interpret):
    """Kernel forward; reconstructs the scan-path residual structure."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_train_fwd_pallas,
    )

    ys, h_final, g0, g1, h0_new, c0_new, c1_new = lstm2_train_fwd_pallas(
        x_tm, keep_tm[:, 0], params[0], params[1], interpret=interpret
    )

    def shift(a):  # h_prev(t) = h_new(t-1), zero-initialized
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

    t_len = x_tm.shape[0]
    res = (
        (g0, shift(h0_new), shift(c0_new), jnp.zeros((t_len, 0))),
        (g1, shift(ys), shift(c1_new), h0_new * keep_tm[:, 0]),
    )
    carry = (
        (h0_new[-1], c0_new[-1]),
        (h_final, c1_new[-1]),
    )
    return carry, ys, res


def _bwd_layered_pallas(res, keep_tm, params, dys, dh_final, interpret):
    """Per-layer in-kernel reverse chains, top-down.

    The inter-layer coupling (dh of layer l gets dgates_{l+1} @ w_ih^T the
    same step) only flows downward, so each layer's whole-time chain can
    run after the one above finishes — the coupling term becomes ONE
    MXU-shaped (T*B, 4H) x (4H, H) matmul between kernel launches instead
    of a per-step op inside the loop.
    """
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm_bwd_chain_pallas,
    )

    n_layers = len(params)
    batch = dys.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    dgates_series = [None] * n_layers
    dh_series = dys  # (T, B, H): per-step contributions into the top layer
    zeros_hf = jnp.zeros((batch, h_dim), dys.dtype)
    for layer in reversed(range(n_layers)):
        g_s, _, c_prev_s, _ = res[layer]
        dhf = dh_final if layer == n_layers - 1 else zeros_hf
        dgates = lstm_bwd_chain_pallas(
            g_s, c_prev_s, dh_series, dhf, params[layer]["w_hh"],
            interpret=interpret,
        )
        dgates_series[layer] = dgates
        if layer > 0:
            dx = dgates.reshape(-1, 4 * h_dim) @ params[layer]["w_ih"].T
            dh_series = dx.reshape(g_s.shape[0], batch, h_dim) * keep_tm[
                :, layer - 1
            ]
    return tuple(dgates_series)


def _bwd_fused2_pallas(res, keep_tm, params, dys, dh_final, interpret):
    """Both layers' reverse chains in ONE kernel walk (2-layer case).

    The inter-layer hop (dgates1 @ w_ih1^T) * keep happens in-register per
    step instead of as a between-kernel matmul, halving the serial length
    vs the layered path and keeping the (T, B, H) hop series out of HBM.
    ``dys=None`` (final-hidden-only path) omits the stream in-kernel.
    """
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_bwd_chain_pallas,
    )

    g0_s, _, cp0_s, _ = res[0]
    g1_s, _, cp1_s, _ = res[1]
    dg0, dg1 = lstm2_bwd_chain_pallas(
        g0_s, g1_s, cp0_s, cp1_s, dys, keep_tm[:, 0], dh_final,
        params[0]["w_hh"], params[1]["w_hh"], params[1]["w_ih"],
        interpret=interpret,
    )
    return (dg0, dg1)


# In-place reverse-walk storage, read at TRACE time.  'auto' overwrites
# the forward gate stacks with the dgates series instead of letting
# lax.scan allocate fresh ys buffers; 'off' keeps the ys-emitting scan
# (benchmark A/B + fallback).
_BWD_INPLACE = "auto"


def set_bwd_inplace(mode: str) -> str:
    global _BWD_INPLACE
    prev = _BWD_INPLACE
    assert mode in ("auto", "off")
    _BWD_INPLACE = mode
    return prev


def _bwd_dgates(res, keep_tm, params, dys, dh_final):
    """Dispatch: fused 2-layer kernel > per-layer kernels > XLA scan.

    ``dys`` may be None (structurally-zero sequence cotangent); only the
    fused kernel exploits it — fallbacks materialize the zeros.
    """
    g0_s = res[0][0]
    t_len, batch = g0_s.shape[0], g0_s.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    on_tpu = jax.default_backend() == "tpu"
    interpret = _BWD_KERNEL_MODE == "interpret"
    if _BWD_KERNEL_MODE != "off":
        from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
            bwd2_kernel_supported,
        )

        # the h_prev series always carries the COMPUTE dtype (g/c_prev
        # may be bf16 residual streams under runtime.lstm_residual_dtype)
        f32_large = res[0][1].dtype == jnp.float32
        if (on_tpu or interpret) and len(params) == 2 and (
            bwd2_kernel_supported(batch, t_len, h_dim,
                                  allow_large=interpret,
                                  f32_large=f32_large)
        ):
            return _bwd_fused2_pallas(
                res, keep_tm, params, dys, dh_final, interpret
            )
    if dys is None:
        dys = jnp.zeros((t_len, batch, h_dim), dh_final.dtype)
    if _BWD_KERNEL_MODE != "off":
        from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
            bwd_kernel_supported,
        )

        f32_large = res[0][1].dtype == jnp.float32
        if (on_tpu or interpret) and bwd_kernel_supported(
            batch, t_len, h_dim, allow_large=interpret,
            f32_large=f32_large,
        ):
            return _bwd_layered_pallas(
                res, keep_tm, params, dys, dh_final, interpret
            )
    if (
        _BWD_INPLACE != "off"
        and g0_s.dtype == dys.dtype == dh_final.dtype
    ):
        return _bwd_scan_inplace(res, keep_tm, params, dys, dh_final)
    return _bwd_scan(res, keep_tm, params, dys, dh_final)


def _bwd_scan_inplace(res, keep_tm, params, dys, dh_final):
    """Reverse walk writing each step's dgates over the same slot of the
    (dead-after-read) forward gate stack, threaded as scan *carry*.

    Same math as ``_bwd_scan``, different storage.  Motivation (r3z/r3aa,
    big config b256 bf16): XLA zero-initializes every ``lax.scan`` ys
    buffer with a materialized broadcast and never elides the fill even
    though the loop fully overwrites it — six [372,256,2048] fills were
    ~3.6 ms of the 39.1 ms step.  Reusing the gate stacks is expected to
    remove the three backward fills (and their live HBM); see
    benchmarks/r4a_tpu.json for the measured on-chip verdict per
    geometry.  In-place is safe:
    iteration t reads g[t] before overwriting g[t], and later iterations
    touch strictly smaller t.  Engages only when gate and cotangent
    dtypes agree (the slot write would otherwise round the dgates into
    the residual dtype).
    """
    n_layers = len(params)
    w_ih_t = [p["w_ih"].T for p in params]
    w_hh_t = [p["w_hh"].T for p in params]
    t_len, batch = dys.shape[0], dys.shape[1]
    h_dim = params[0]["w_hh"].shape[0]

    g_bufs = tuple(r[0] for r in res)
    c_prev_series = tuple(r[2] for r in res)

    def step(carry, inp):
        bufs, dstates = carry
        c_t, keep_t, dy, t = inp
        bufs = list(bufs)
        dstates = list(dstates)
        dx_up = None
        for layer in reversed(range(n_layers)):
            g = jax.lax.dynamic_slice_in_dim(bufs[layer], t, 1, axis=0)[0]
            dh_l, dc_l = dstates[layer]
            dh_t = dh_l
            if layer == n_layers - 1:
                dh_t = dh_t + dy
            if dx_up is not None:
                dh_t = dh_t + dx_up * keep_t[layer]
            dgates, dc_prev = _cell_bwd(g, c_t[layer], dh_t, dc_l)
            bufs[layer] = jax.lax.dynamic_update_slice_in_dim(
                bufs[layer], dgates[None], t, axis=0
            )
            dstates[layer] = (dgates @ w_hh_t[layer], dc_prev)
            dx_up = dgates @ w_ih_t[layer] if layer > 0 else None
        return (tuple(bufs), tuple(dstates)), None

    zeros = jnp.zeros((batch, h_dim), dys.dtype)
    init_d = tuple(
        (dh_final if layer == n_layers - 1 else zeros, zeros)
        for layer in range(n_layers)
    )
    (bufs, _), _ = jax.lax.scan(
        step,
        (g_bufs, init_d),
        (c_prev_series, keep_tm, dys, jnp.arange(t_len)),
        reverse=True,
        unroll=4,
    )
    return bufs


def _bwd_scan(res, keep_tm, params, dys, dh_final):
    """Reverse scan emitting per-layer dgates; no weight math inside."""
    n_layers = len(params)
    w_ih_t = [p["w_ih"].T for p in params]
    w_hh_t = [p["w_hh"].T for p in params]

    def step(carry, inp):
        res_t, keep_t, dy = inp
        dstates = list(carry)  # [(dh_l, dc_l)] per layer
        dgates_out = [None] * n_layers
        dx_up = None  # gradient flowing down from the layer above
        for layer in reversed(range(n_layers)):
            g, h_prev, c_prev, _ = res_t[layer]
            dh_l, dc_l = dstates[layer]
            dh_t = dh_l
            if layer == n_layers - 1:
                dh_t = dh_t + dy
            if dx_up is not None:
                dh_t = dh_t + dx_up * keep_t[layer]
            dgates, dc_prev = _cell_bwd(g, c_prev, dh_t, dc_l)
            dgates_out[layer] = dgates
            dh_prev = dgates @ w_hh_t[layer]
            dstates[layer] = (dh_prev, dc_prev)
            dx_up = dgates @ w_ih_t[layer] if layer > 0 else None
        return tuple(dstates), tuple(dgates_out)

    batch = dys.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    zeros = jnp.zeros((batch, h_dim), dys.dtype)
    init = tuple(
        (dh_final if layer == n_layers - 1 else zeros, zeros)
        for layer in range(n_layers)
    )
    carry, dgates_series = jax.lax.scan(
        step, init, (res, keep_tm, dys), reverse=True, unroll=4
    )
    return dgates_series


@jax.custom_vjp
def fused_lstm(x, keep, params: Tuple[dict, ...]):
    """(B, T, D), keep (B, T, L-1, H) -> (ys (B, T, H), h_final (B, H))."""
    x_tm = jnp.swapaxes(x, 0, 1)
    keep_tm = _keep_tm(keep)
    carry, ys, _ = _fwd_scan(x_tm, keep_tm, params)
    return jnp.swapaxes(ys, 0, 1), carry[-1][0]


def _keep_tm(keep):
    # (B, T, L-1, H) -> (T, L-1, B, H)
    return jnp.transpose(keep, (1, 2, 0, 3))


def _fused_fwd(x, keep, params, final_only=False):
    x_tm = jnp.swapaxes(x, 0, 1)
    keep_tm = _keep_tm(keep)
    use_kernel, interpret = _fwd_kernel_ok(x_tm, params)
    use_layered = False
    if not use_kernel:
        use_layered, interpret = _fwd_layered_ok(x_tm, params)
    if use_kernel:
        if _res2_ok(x_tm, params, interpret):
            carry, ys, res = _fwd_pallas_res2(x_tm, keep_tm, params,
                                              interpret,
                                              final_only=final_only)
        else:
            carry, ys, res = _fwd_pallas(x_tm, keep_tm, params, interpret)
        dtype = x.dtype
        out = (jnp.swapaxes(ys, 0, 1).astype(dtype),
               carry[-1][0].astype(dtype))
    elif use_layered:
        carry, ys, res = _fwd_pallas_layered(x_tm, keep_tm, params,
                                             interpret)
        dtype = x.dtype
        out = (jnp.swapaxes(ys, 0, 1).astype(dtype),
               carry[-1][0].astype(dtype))
    else:
        carry, ys, res = _fwd_scan(x_tm, keep_tm, params)
        out = (jnp.swapaxes(ys, 0, 1), carry[-1][0])
    return out, (x_tm, keep_tm, params, res, carry)


def _fused_bwd(saved, grads):
    dys_bt, dh_final = grads
    return _fused_bwd_impl(saved, jnp.swapaxes(dys_bt, 0, 1), dh_final)


def _fused_bwd_impl(saved, dys, dh_final):
    """Shared backward; ``dys`` is time-major (T, B, H) or None (zero)."""
    x_tm, keep_tm, params, res, carry = saved
    if isinstance(res, dict):  # residual-native (v2) kernel path
        return _bwd_impl_res2(saved, dys, dh_final)
    n_layers = len(params)

    dgates_series = _bwd_dgates(res, keep_tm, params, dys, dh_final)

    t_len, batch = x_tm.shape[0], x_tm.shape[1]

    def flat(a):
        return a.reshape(t_len * batch, -1)

    dparams = []
    dkeep_layers = []
    for layer in range(n_layers):
        g_s, h_prev_s, c_prev_s, x_l_s = res[layer]
        dg_s = dgates_series[layer]
        x_series = x_tm if layer == 0 else x_l_s
        # hoisted weight gradients: ONE big contraction each
        dparams.append({
            "w_ih": flat(x_series).T @ flat(dg_s),
            "w_hh": flat(h_prev_s).T @ flat(dg_s),
            "b": dg_s.sum(axis=(0, 1)),
        })
        if layer > 0:
            # d(keep_{layer-1}) = d(x_l) * h_{layer-1,new}; the NEW hidden
            # series of the layer BELOW = its h_prev shifted by one step
            # plus the final carry
            dx_l = dg_s @ params[layer]["w_ih"].T
            h_prev_below = res[layer - 1][1]
            h_new_series = jnp.concatenate(
                [h_prev_below[1:], carry[layer - 1][0][None]], axis=0
            )
            dkeep_layers.append(dx_l * h_new_series)

    dx = jnp.swapaxes(dgates_series[0] @ params[0]["w_ih"].T, 0, 1)
    if dkeep_layers:
        dkeep_tm = jnp.stack(dkeep_layers, axis=1)  # (T, L-1, B, H)
        dkeep = jnp.transpose(dkeep_tm, (2, 0, 1, 3))  # (B, T, L-1, H)
    else:
        dkeep = jnp.zeros((batch, t_len, 0, params[0]["w_hh"].shape[0]),
                          x_tm.dtype)
    # kernel-path residuals are f32 regardless of the compute dtype;
    # custom_vjp cotangents must match the primal dtypes exactly
    dx = dx.astype(x_tm.dtype)
    dkeep = dkeep.astype(keep_tm.dtype)
    dparams = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), tuple(dparams), tuple(params))
    return dx, dkeep, tuple(dparams)


fused_lstm.defvjp(_fused_fwd, _fused_bwd)


@jax.custom_vjp
def fused_lstm_final(x, keep, params: Tuple[dict, ...]):
    """Like fused_lstm but returns ONLY h_final (B, H).

    The final-hidden-only encoder path (SequenceEncoder, lengths=None):
    the sequence output's cotangent is structurally zero here, so the
    backward omits the (T, B, H) dh-contribution stream entirely instead
    of materializing and streaming ~12 MB of zeros per step.
    """
    x_tm = jnp.swapaxes(x, 0, 1)
    carry, _, _ = _fwd_scan(x_tm, _keep_tm(keep), params)
    return carry[-1][0]


def _fused_final_fwd(x, keep, params):
    (ys, h_final), saved = _fused_fwd(x, keep, params, final_only=True)
    return h_final, saved


def _fused_final_bwd(saved, dh_final):
    return _fused_bwd_impl(saved, None, dh_final)


fused_lstm_final.defvjp(_fused_final_fwd, _fused_final_bwd)


def fused_lstm2(x, keep2, p0, p1):
    """2-layer convenience wrapper; keep2 is (B, T, H)."""
    keep = keep2[:, :, None, :]
    return fused_lstm(x, keep, (p0, p1))


# ---------------------------------------------------------------------------
# GRU twin: same hoisted-gradient structure, GRU cell math
# ---------------------------------------------------------------------------


def _gru_fwd_cell(h, ih_t, p):
    hh = h @ p["w_hh"] + p["b_hh"]
    xr, xz, xn = jnp.split(ih_t, 3, axis=-1)
    hr, hz, hn = jnp.split(hh, 3, axis=-1)
    r = _sig(xr + hr)
    z = _sig(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h, (r, z, n, hn)


def _gru_fwd_scan(x_tm, keep_tm, params):
    t_len, batch, _ = x_tm.shape
    n_layers = len(params)
    h_dim = params[0]["w_hh"].shape[0]
    ih0 = x_tm @ params[0]["w_ih"] + params[0]["b_ih"]

    def step(carry, inp):
        ih0_t, keep_t = inp
        new_carry, res = [], []
        x_l = None
        for layer, p in enumerate(params):
            h = carry[layer]
            ih_t = ih0_t if layer == 0 else x_l @ p["w_ih"] + p["b_ih"]
            h_new, acts = _gru_fwd_cell(h, ih_t, p)
            res.append((h,) + acts + (x_l if layer > 0 else jnp.zeros((0,)),))
            new_carry.append(h_new)
            x_l = h_new
            if layer < n_layers - 1:
                x_l = x_l * keep_t[layer]
        return tuple(new_carry), (new_carry[-1], tuple(res))

    zeros = jnp.zeros((batch, h_dim), x_tm.dtype)
    carry, (ys, res) = jax.lax.scan(
        step, tuple(zeros for _ in range(n_layers)), (ih0, keep_tm), unroll=4
    )
    return carry, ys, res


def _gru_cell_bwd(dh_t, h_prev, r, z, n, hn, p):
    """Returns (dih (3H), dhh_pre (3H), dh_prev_direct)."""
    dz = dh_t * (h_prev - n)
    dn = dh_t * (1.0 - z)
    dh_prev = dh_t * z
    dn_pre = dn * (1.0 - n * n)
    dxn = dn_pre
    dhn = dn_pre * r
    dr = dn_pre * hn
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dih = jnp.concatenate([dr_pre, dz_pre, dxn], axis=-1)
    dhh = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
    return dih, dhh, dh_prev


@jax.custom_vjp
def fused_gru(x, keep, params: Tuple[dict, ...]):
    """(B, T, D), keep (B, T, L-1, H) -> (ys (B, T, H), h_final (B, H))."""
    x_tm = jnp.swapaxes(x, 0, 1)
    carry, ys, _ = _gru_fwd_scan(x_tm, _keep_tm(keep), params)
    return jnp.swapaxes(ys, 0, 1), carry[-1]


def _gru_fwd_kernel_ok(x_tm, params):
    if _FWD_KERNEL_MODE == "off" or len(params) != 2:
        return False, False
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        gru_fwd_kernel_supported,
    )

    t_len, batch = x_tm.shape[0], x_tm.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    interpret = _FWD_KERNEL_MODE == "interpret"
    on_tpu = jax.default_backend() == "tpu"
    ok = (on_tpu or interpret) and gru_fwd_kernel_supported(
        batch, t_len, h_dim, len(params), allow_large=interpret
    )
    return ok, interpret


def _gru_fwd_pallas(x_tm, keep_tm, params, interpret):
    """Kernel forward; reconstructs the scan-path residual structure."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        gru2_train_fwd_pallas,
    )

    ys, h_final, layers = gru2_train_fwd_pallas(
        x_tm, keep_tm[:, 0], params[0], params[1], interpret=interpret
    )

    def shift(a):
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

    t_len = x_tm.shape[0]
    (r0, z0, n0, hn0, h0_new) = layers[0]
    (r1, z1, n1, hn1, h1_new) = layers[1]
    res = (
        (shift(h0_new), r0, z0, n0, hn0, jnp.zeros((t_len, 0))),
        (shift(h1_new), r1, z1, n1, hn1, h0_new * keep_tm[:, 0]),
    )
    carry = (h0_new[-1], h_final)
    return carry, ys, res


def _gru_res2_ok(x_tm, params, interpret):
    """Use the GRU residual-native (v2) kernel pair when both ends
    qualify — same selection rule as the LSTM's ``_res2_ok``.  Removes
    the legacy path's h_prev shift-copies, the external x1 rebuild, the
    pre-kernel 5H re-packing the fused backward paid (r2p's loss), and
    every [:t_len] slice."""
    if _BWD_KERNEL_MODE == "off" or _RES2_MODE == "off":
        return False
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        gru_bwd2_res_kernel_supported,
        gru_res2_kernel_supported,
    )

    t_len, batch = x_tm.shape[0], x_tm.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    return gru_res2_kernel_supported(
        batch, t_len, h_dim, allow_large=interpret
    ) and gru_bwd2_res_kernel_supported(
        batch, t_len, h_dim, allow_large=interpret
    )


def _gru_fwd_pallas_res2(x_tm, keep_tm, params, interpret,
                         final_only=False):
    """GRU v2 kernel forward: residuals come out exactly as consumed."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        gru2_train_fwd_residuals,
    )

    res_dtype = (
        jnp.bfloat16
        if (final_only and _RES2_DTYPE == "bfloat16")
        else jnp.float32
    )
    packed, h0p, h1p, x1, keep_pad, finals, t_pad = (
        gru2_train_fwd_residuals(
            x_tm, keep_tm[:, 0], params[0], params[1], interpret=interpret,
            res_dtype=res_dtype,
        )
    )
    t_len = x_tm.shape[0]
    # ys(t) = h1_prev(t+1) for t < T-1, ys(T-1) = h1_final — a view of
    # the residuals, only built when the sequence output is consumed
    # (DCE'd on the final-hidden path, where bf16 residuals may engage)
    ys = jnp.concatenate(
        [h1p[1:t_len].astype(finals.dtype), finals[1][None]], axis=0)
    carry = (finals[0], finals[1])
    res = {"gru_res2": (packed, h0p, h1p, x1, keep_pad, finals)}
    return carry, ys, res


def _gru_bwd_impl_res2(saved, dys, dh_final):
    """Backward for the GRU residual-native path: fused reverse-chain
    kernel over consumer-shaped buffers, then unsliced contractions over
    t_pad (padded dih/dhn rows are zero).  ``dhh`` shares its first 2H
    lanes with ``dih`` (dr_pre, dz_pre), so the kernel emits only the dhn
    third extra and dW_hh/b_hh are assembled from weight-sized pieces."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        gru2_bwd_chain_res_padded,
    )

    x_tm, keep_tm, params, res, carry = saved
    packed, h0p, h1p, x1, keep_pad, finals = res["gru_res2"]
    t_len, batch = x_tm.shape[0], x_tm.shape[1]
    t_pad = packed.shape[0]
    h_dim = params[0]["w_hh"].shape[0]
    interpret = _FWD_KERNEL_MODE == "interpret" or (
        _BWD_KERNEL_MODE == "interpret"
    )

    if dys is not None and t_pad != t_len:
        dys = jnp.pad(dys, ((0, t_pad - t_len), (0, 0), (0, 0)))
    dih0, dhn0, dih1, dhn1 = gru2_bwd_chain_res_padded(
        packed, h0p, h1p, keep_pad, dys, dh_final,
        params[0]["w_hh"], params[1]["w_hh"], params[1]["w_ih"],
        t_len, interpret=interpret,
    )

    x_pad = x_tm
    if t_pad != t_len:
        x_pad = jnp.pad(x_tm, ((0, t_pad - t_len), (0, 0), (0, 0)))
    x_pad = x_pad.astype(packed.dtype)

    def flat(a):
        return a.reshape(t_pad * batch, -1)

    def contract(a, b):
        return jnp.matmul(flat(a).T, flat(b),
                          preferred_element_type=jnp.float32)

    def layer_grads(x_series, hp, dih, dhn):
        # dW_hh = hp^T @ [dr|dz|dhn]: the first 2H columns come from the
        # dih contraction (shared lanes), the dhn third from its own —
        # both weight-sized, so the concat is trivial
        c_rz = contract(hp, dih)[:, :2 * h_dim]
        c_n = contract(hp, dhn)
        b_ih = dih.astype(jnp.float32).sum(axis=(0, 1))
        b_hh = jnp.concatenate(
            [b_ih[:2 * h_dim], dhn.astype(jnp.float32).sum(axis=(0, 1))])
        return {
            "w_ih": contract(x_series, dih),
            "w_hh": jnp.concatenate([c_rz, c_n], axis=1),
            "b_ih": b_ih,
            "b_hh": b_hh,
        }

    dparams = (
        layer_grads(x_pad, h0p, dih0, dhn0),
        layer_grads(x1, h1p, dih1, dhn1),
    )
    # d(keep) = d(x1) * h0_new; h0_new(t) = h0_prev(t+1), final from the
    # finals buffer.  keep is a dropout mask (no grad path) — XLA DCEs it.
    dx_l = (dih1 @ params[1]["w_ih"].T)[:t_len]
    h0_new = jnp.concatenate(
        [h0p[1:t_len].astype(finals.dtype), finals[0][None]], axis=0)
    dkeep = jnp.transpose((dx_l * h0_new)[:, None], (2, 0, 1, 3))
    dx = jnp.swapaxes((dih0 @ params[0]["w_ih"].T)[:t_len], 0, 1)
    return dx, dkeep, dparams


def _gru_vjp_fwd(x, keep, params, final_only=False):
    x_tm = jnp.swapaxes(x, 0, 1)
    keep_tm = _keep_tm(keep)
    use_kernel, interpret = _gru_fwd_kernel_ok(x_tm, params)
    if use_kernel:
        if _gru_res2_ok(x_tm, params, interpret):
            carry, ys, res = _gru_fwd_pallas_res2(
                x_tm, keep_tm, params, interpret, final_only=final_only)
        else:
            carry, ys, res = _gru_fwd_pallas(x_tm, keep_tm, params,
                                             interpret)
        dtype = x.dtype
        out = (jnp.swapaxes(ys, 0, 1).astype(dtype),
               carry[-1].astype(dtype))
        return out, (x_tm, keep_tm, params, res, carry)
    carry, ys, res = _gru_fwd_scan(x_tm, keep_tm, params)
    return (jnp.swapaxes(ys, 0, 1), carry[-1]), (x_tm, keep_tm, params, res,
                                                 carry)


def _gru_bwd_layered_pallas(res, keep_tm, params, dys, dh_final, interpret):
    """Per-layer in-kernel GRU reverse chains, top-down (see LSTM twin)."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        gru_bwd_chain_pallas,
    )

    n_layers = len(params)
    batch = dys.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    dih_series = [None] * n_layers
    dhh_series = [None] * n_layers
    dh_contrib = dys
    zeros_hf = jnp.zeros((batch, h_dim), dys.dtype)
    for layer in reversed(range(n_layers)):
        h_prev_s, r_s, z_s, n_s, hn_s, _ = res[layer]
        dhf = dh_final if layer == n_layers - 1 else zeros_hf
        dih, dhh = gru_bwd_chain_pallas(
            h_prev_s, r_s, z_s, n_s, hn_s, dh_contrib, dhf,
            params[layer]["w_hh"], interpret=interpret,
        )
        dih_series[layer] = dih
        dhh_series[layer] = dhh
        if layer > 0:
            dx = dih.reshape(-1, 3 * h_dim) @ params[layer]["w_ih"].T
            dh_contrib = dx.reshape(dih.shape[0], batch, h_dim) * keep_tm[
                :, layer - 1
            ]
    return tuple(dih_series), tuple(dhh_series)


def _gru_bwd_fused2_pallas(res, keep_tm, params, dys, dh_final, interpret):
    """Both GRU layers' reverse chains in ONE kernel walk (2-layer case)."""
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        gru2_bwd_chain_pallas,
    )

    (d0, d1) = gru2_bwd_chain_pallas(
        res[0][:5], res[1][:5], dys, keep_tm[:, 0], dh_final,
        params[0]["w_hh"], params[1]["w_hh"], params[1]["w_ih"],
        interpret=interpret,
    )
    return (d0[0], d1[0]), (d0[1], d1[1])


def _gru_bwd_kernel_ok(dys, params):
    """Returns (fused2_ok, layered_ok, interpret)."""
    if _BWD_KERNEL_MODE == "off":
        return False, False, False
    from multimodal_emotion_detection_tpu.ops import lstm_kernel as _lk
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        gru2_bwd_kernel_supported,
        gru_bwd_kernel_supported,
    )

    t_len, batch = dys.shape[0], dys.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    interpret = _BWD_KERNEL_MODE == "interpret"
    on_tpu = jax.default_backend() == "tpu"
    # fused-GRU measured slower than layered on chip (r2p_tpu.json); the
    # interpret path still exercises it so parity stays tested
    fused2 = (
        (interpret or (on_tpu and _lk.GRU_BWD2_ENABLED))
        and len(params) == 2
        and gru2_bwd_kernel_supported(batch, t_len, h_dim,
                                      allow_large=interpret)
    )
    layered = (on_tpu or interpret) and gru_bwd_kernel_supported(
        batch, t_len, h_dim, allow_large=interpret
    )
    return fused2, layered, interpret


def _gru_vjp_bwd(saved, grads):
    dys_bt, dh_final = grads
    return _gru_bwd_impl(saved, jnp.swapaxes(dys_bt, 0, 1), dh_final)


def _gru_bwd_impl(saved, dys, dh_final):
    """Shared backward; ``dys`` is time-major (T, B, H) or None (zero)."""
    x_tm, keep_tm, params, res, carry = saved
    if isinstance(res, dict):  # residual-native (v2) kernel path
        return _gru_bwd_impl_res2(saved, dys, dh_final)
    if dys is None:
        dys = jnp.zeros((x_tm.shape[0], x_tm.shape[1],
                         params[0]["w_hh"].shape[0]), dh_final.dtype)
    n_layers = len(params)
    w_ih_t = [p["w_ih"].T for p in params]
    w_hh_t = [p["w_hh"].T for p in params]

    def step(carry_b, inp):
        res_t, keep_t, dy = inp
        dstates = list(carry_b)
        dih_out = [None] * n_layers
        dhh_out = [None] * n_layers
        dx_up = None
        for layer in reversed(range(n_layers)):
            h_prev, r, z, n, hn, _ = res_t[layer]
            dh_t = dstates[layer]
            if layer == n_layers - 1:
                dh_t = dh_t + dy
            if dx_up is not None:
                dh_t = dh_t + dx_up * keep_t[layer]
            dih, dhh, dh_direct = _gru_cell_bwd(dh_t, h_prev, r, z, n, hn,
                                                params[layer])
            dih_out[layer] = dih
            dhh_out[layer] = dhh
            dstates[layer] = dh_direct + dhh @ w_hh_t[layer]
            dx_up = dih @ w_ih_t[layer] if layer > 0 else None
        return tuple(dstates), (tuple(dih_out), tuple(dhh_out))

    batch = dys.shape[1]
    h_dim = params[0]["w_hh"].shape[0]
    zeros = jnp.zeros((batch, h_dim), dys.dtype)
    init = tuple(
        dh_final if layer == n_layers - 1 else zeros
        for layer in range(n_layers)
    )
    fused2_ok, layered_ok, interpret = _gru_bwd_kernel_ok(dys, params)
    if fused2_ok:
        dih_series, dhh_series = _gru_bwd_fused2_pallas(
            res, keep_tm, params, dys, dh_final, interpret
        )
    elif layered_ok:
        dih_series, dhh_series = _gru_bwd_layered_pallas(
            res, keep_tm, params, dys, dh_final, interpret
        )
    else:
        _, (dih_series, dhh_series) = jax.lax.scan(
            step, init, (res, keep_tm, dys), reverse=True, unroll=4
        )

    t_len = x_tm.shape[0]

    def flat(a):
        return a.reshape(t_len * batch, -1)

    dparams = []
    dkeep_layers = []
    for layer in range(n_layers):
        h_prev_s = res[layer][0]
        x_l_s = res[layer][5]
        x_series = x_tm if layer == 0 else x_l_s
        dparams.append({
            "w_ih": flat(x_series).T @ flat(dih_series[layer]),
            "w_hh": flat(h_prev_s).T @ flat(dhh_series[layer]),
            "b_ih": dih_series[layer].sum(axis=(0, 1)),
            "b_hh": dhh_series[layer].sum(axis=(0, 1)),
        })
        if layer > 0:
            dx_l = dih_series[layer] @ params[layer]["w_ih"].T
            h_prev_below = res[layer - 1][0]
            h_new_series = jnp.concatenate(
                [h_prev_below[1:], carry[layer - 1][None]], axis=0
            )
            dkeep_layers.append(dx_l * h_new_series)

    dx = jnp.swapaxes(dih_series[0] @ params[0]["w_ih"].T, 0, 1)
    if dkeep_layers:
        dkeep = jnp.transpose(jnp.stack(dkeep_layers, axis=1), (2, 0, 1, 3))
    else:
        dkeep = jnp.zeros((batch, t_len, 0, h_dim), x_tm.dtype)
    return dx, dkeep, tuple(dparams)


fused_gru.defvjp(_gru_vjp_fwd, _gru_vjp_bwd)


@jax.custom_vjp
def fused_gru_final(x, keep, params: Tuple[dict, ...]):
    """Like fused_gru but returns ONLY h_final (B, H).

    The final-hidden-only encoder path: the sequence output's cotangent
    is structurally zero, so the backward omits the (T, B, H)
    dh-contribution stream entirely (the GRU twin of
    ``fused_lstm_final``); bf16 residual streams
    (``runtime.lstm_residual_dtype``) may engage here — ys is never
    built from rounded h1_prev on this path.
    """
    x_tm = jnp.swapaxes(x, 0, 1)
    carry, _, _ = _gru_fwd_scan(x_tm, _keep_tm(keep), params)
    return carry[-1]


def _gru_final_fwd(x, keep, params):
    (ys, h_final), saved = _gru_vjp_fwd(x, keep, params, final_only=True)
    return h_final, saved


def _gru_final_bwd(saved, dh_final):
    return _gru_bwd_impl(saved, None, dh_final)


fused_gru_final.defvjp(_gru_final_fwd, _gru_final_bwd)
