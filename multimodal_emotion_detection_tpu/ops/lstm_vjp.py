"""Custom VJP for the fused 2-layer LSTM: hoisted weight gradients.

Why: XLA's automatic reverse scan accumulates every weight gradient
*inside* the sequential loop — ~6 small latency-bound matmuls per step;
measured 4.4 ms backward vs 0.9 ms forward at (B=32, T=375, H=256) on v5e
(benchmarks/ablation_tpu.json).  The serial part of BPTT is only the
``dgates`` chain (3 matmuls per step); every weight gradient is a big
contraction over time that the MXU should do ONCE:

    dW_hh = h_series[:-1]^T  @ dgates_series      (one (H, T*B)x(T*B, 4H))
    dW_ih = x_series^T       @ dgates_series
    db    = sum_t dgates_t

So the custom backward runs a lean reverse scan that *emits* per-step
dgates, then hoists all weight-gradient contractions outside the loop.

Forward saves per-step pre-activation gates and states (~150 MB at the
flagship shape — cheap next to the 40 GB the naive path needed before
remat).  Gradients verified against ``jax.grad`` of the plain scan to
float32 tolerance (tests/test_models.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _sig(x):
    return jax.nn.sigmoid(x)


def _fwd_scan(x_tm, keep_tm, p0, p1):
    """Time-major forward storing residual series.

    x_tm: (T, B, D); keep_tm: (T, B, H) inter-layer dropout keep-mask
    (ones when disabled).  Returns h1 series + residual stacks.
    """
    t_len, batch, _ = x_tm.shape
    h_dim = p0["w_hh"].shape[0]
    ih0 = x_tm @ p0["w_ih"] + p0["b"]  # hoisted (MXU)

    def step(carry, inp):
        h0, c0, h1, c1 = carry
        ih0_t, keep_t = inp
        g0 = ih0_t + h0 @ p0["w_hh"]
        i0, f0, gg0, o0 = jnp.split(g0, 4, axis=-1)
        c0n = _sig(f0) * c0 + _sig(i0) * jnp.tanh(gg0)
        h0n = _sig(o0) * jnp.tanh(c0n)
        x1 = h0n * keep_t
        g1 = x1 @ p1["w_ih"] + p1["b"] + h1 @ p1["w_hh"]
        i1, f1, gg1, o1 = jnp.split(g1, 4, axis=-1)
        c1n = _sig(f1) * c1 + _sig(i1) * jnp.tanh(gg1)
        h1n = _sig(o1) * jnp.tanh(c1n)
        new_carry = (h0n, c0n, h1n, c1n)
        # residuals: prev states + pre-activations + layer-1 input
        res = (g0, g1, h0, c0, h1, c1, x1)
        return new_carry, (h1n, res)

    zeros = jnp.zeros((batch, h_dim), x_tm.dtype)
    carry, (ys, res) = jax.lax.scan(
        step, (zeros, zeros, zeros, zeros), (ih0, keep_tm), unroll=4
    )
    return carry, ys, res


def _bwd_scan(res, keep_tm, p0, p1, dys, dh_final, dc_final):
    """Reverse scan emitting per-step dgates; no weight math inside."""
    g0s, g1s, h0s, c0s, h1s, c1s, x1s = res
    w_hh0_t = p0["w_hh"].T
    w_ih1_t = p1["w_ih"].T
    w_hh1_t = p1["w_hh"].T

    def step(carry, inp):
        dh0, dc0, dh1, dc1 = carry
        g0, g1, h0p, c0p, h1p, c1p, keep_t, dy = inp

        # layer 1 cell backward
        i1, f1, gg1, o1 = jnp.split(g1, 4, axis=-1)
        si1, sf1, so1 = _sig(i1), _sig(f1), _sig(o1)
        tg1 = jnp.tanh(gg1)
        c1 = sf1 * c1p + si1 * tg1
        tc1 = jnp.tanh(c1)
        dh1_t = dh1 + dy
        dc1_t = dc1 + dh1_t * so1 * (1.0 - tc1 * tc1)
        dg1 = jnp.concatenate([
            dc1_t * tg1 * si1 * (1.0 - si1),
            dc1_t * c1p * sf1 * (1.0 - sf1),
            dc1_t * si1 * (1.0 - tg1 * tg1),
            dh1_t * tc1 * so1 * (1.0 - so1),
        ], axis=-1)
        dx1 = dg1 @ w_ih1_t
        dh1_prev = dg1 @ w_hh1_t
        dc1_prev = dc1_t * sf1

        # layer 0 cell backward (gets dx1 through the dropout mask)
        i0, f0, gg0, o0 = jnp.split(g0, 4, axis=-1)
        si0, sf0, so0 = _sig(i0), _sig(f0), _sig(o0)
        tg0 = jnp.tanh(gg0)
        c0 = sf0 * c0p + si0 * tg0
        tc0 = jnp.tanh(c0)
        dh0_t = dh0 + dx1 * keep_t
        dc0_t = dc0 + dh0_t * so0 * (1.0 - tc0 * tc0)
        dg0 = jnp.concatenate([
            dc0_t * tg0 * si0 * (1.0 - si0),
            dc0_t * c0p * sf0 * (1.0 - sf0),
            dc0_t * si0 * (1.0 - tg0 * tg0),
            dh0_t * tc0 * so0 * (1.0 - so0),
        ], axis=-1)
        dh0_prev = dg0 @ w_hh0_t
        dc0_prev = dc0_t * sf0

        return (dh0_prev, dc0_prev, dh1_prev, dc1_prev), (dg0, dg1)

    batch = dys.shape[1]
    h_dim = p0["w_hh"].shape[0]
    zeros = jnp.zeros((batch, h_dim), dys.dtype)
    init = (zeros, zeros, dh_final, dc_final)
    carry, (dg0s, dg1s) = jax.lax.scan(
        step,
        init,
        (g0s, g1s, h0s, c0s, h1s, c1s, keep_tm, dys),
        reverse=True,
        unroll=4,
    )
    dh0_in, dc0_in, dh1_in, dc1_in = carry
    return dg0s, dg1s


@jax.custom_vjp
def fused_lstm2(x, keep, p0, p1):
    """(B, T, D), (B, T, H) keep-mask -> (ys (B, T, H), h_final (B, H))."""
    x_tm = jnp.swapaxes(x, 0, 1)
    keep_tm = jnp.swapaxes(keep, 0, 1)
    carry, ys, _ = _fwd_scan(x_tm, keep_tm, p0, p1)
    return jnp.swapaxes(ys, 0, 1), carry[2]


def _fused_fwd(x, keep, p0, p1):
    x_tm = jnp.swapaxes(x, 0, 1)
    keep_tm = jnp.swapaxes(keep, 0, 1)
    carry, ys, res = _fwd_scan(x_tm, keep_tm, p0, p1)
    out = (jnp.swapaxes(ys, 0, 1), carry[2])
    return out, (x_tm, keep_tm, p0, p1, res, ys, carry)


def _fused_bwd(saved, grads):
    x_tm, keep_tm, p0, p1, res, ys, carry = saved
    dys_bt, dh_final = grads
    dys = jnp.swapaxes(dys_bt, 0, 1)  # (T, B, H)
    dc_final = jnp.zeros_like(dh_final)

    dg0s, dg1s = _bwd_scan(res, keep_tm, p0, p1, dys, dh_final, dc_final)

    g0s, g1s, h0s, c0s, h1s, c1s, x1s = res
    t_len, batch, h_dim = h0s.shape
    gates4 = dg0s.shape[-1]

    def flat(a):
        return a.reshape(t_len * batch, -1)

    # hoisted weight gradients: ONE big contraction each (the whole point)
    dw_ih0 = flat(x_tm).T @ flat(dg0s)
    dw_hh0 = flat(h0s).T @ flat(dg0s)  # h0s holds h0_{t-1} (pre-step state)
    db0 = dg0s.sum(axis=(0, 1))
    dw_ih1 = flat(x1s).T @ flat(dg1s)
    dw_hh1 = flat(h1s).T @ flat(dg1s)
    db1 = dg1s.sum(axis=(0, 1))

    dx = jnp.swapaxes(dg0s @ p0["w_ih"].T, 0, 1)
    # gradient w.r.t. the keep mask (needed only for completeness)
    dx1_series = dg1s @ p1["w_ih"].T
    # recompute h0n = x1 / keep is unsafe (keep may be 0); use x1s * ... :
    # dkeep = dx1 * h0n where h0n = x1s / keep; instead store via identity
    # x1 = h0n * keep -> d keep = dx1 * h0n. h0n = h0s shifted by one step:
    h0n_series = jnp.concatenate([h0s[1:], carry[0][None]], axis=0)
    dkeep = jnp.swapaxes(dx1_series * h0n_series, 0, 1)

    dp0 = {"w_ih": dw_ih0, "w_hh": dw_hh0, "b": db0}
    dp1 = {"w_ih": dw_ih1, "w_hh": dw_hh1, "b": db1}
    return dx, dkeep, dp0, dp1


fused_lstm2.defvjp(_fused_fwd, _fused_bwd)
