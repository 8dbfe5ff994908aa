"""Interpret-mode STRICT numerics of the training-forward recurrence kernel.

Promotes the r2u6 probe evidence into CI (ops/envelope.py): in interpret
mode at ``matmul_precision=highest`` there is no MXU-tiling chaos, so the
kernel must match the scan reference to fp-noise tolerance at every
sequence length of the chip envelope table.  A math regression in the
kernel (gate order, residual streaming, mask wiring) fails HERE on CPU;
Mosaic lowering regressions are caught on chip by
scripts/chip_numerics_gate.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_emotion_detection_tpu.ops.envelope import (
    INTERPRET_STRICT_ATOL,
    LSTM2_TRAIN_FWD_REL_ENVELOPE,
)
from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
    lstm2_train_fwd_pallas,
)

B, D, H = 8, 64, 256


def _params():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    return tuple(
        {"w_ih": 0.2 * jax.random.normal(
            ks[2 + 2 * i], (D if i == 0 else H, 4 * H)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (H, 4 * H)),
         "b": jnp.full((4 * H,), 0.02)}
        for i in range(2)
    )


def _scan_reference(x_tm, keep, params):
    """The r2u6 scan reference: hoisted layer-0 input projection, fused
    cell math, inter-layer keep mask."""

    def cell(hc, gates):
        h_, c_ = hc
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c_n = f * c_ + i * g
        return jnp.tanh(c_n) * o, c_n

    ih0 = x_tm @ params[0]["w_ih"] + params[0]["b"]

    def step(carry, inp):
        (h0, c0, h1, c1) = carry
        ih0_t, keep_t = inp
        g0 = ih0_t + h0 @ params[0]["w_hh"]
        h0n, c0n = cell((h0, c0), g0)
        x1 = h0n * keep_t
        g1 = (x1 @ params[1]["w_ih"] + params[1]["b"]
              + h1 @ params[1]["w_hh"])
        h1n, c1n = cell((h1, c1), g1)
        return (h0n, c0n, h1n, c1n), h1n

    z = jnp.zeros((x_tm.shape[1], H), jnp.float32)
    _, ys = jax.lax.scan(step, (z, z, z, z), (ih0, keep))
    return ys


@pytest.mark.parametrize("t", sorted(LSTM2_TRAIN_FWD_REL_ENVELOPE))
def test_train_fwd_kernel_interpret_strict(t):
    params = _params()
    ks = jax.random.split(jax.random.PRNGKey(42), 2)
    x_tm = jax.random.normal(ks[0], (t, B, D))
    keep = (jax.random.uniform(ks[1], (t, B, H)) > 0.2).astype(jnp.float32)

    with jax.default_matmul_precision("highest"):
        ys_ref = np.asarray(jax.jit(
            lambda x, k: _scan_reference(x, k, params))(x_tm, keep))
        out = jax.jit(
            lambda x, k: lstm2_train_fwd_pallas(
                x, k, params[0], params[1], interpret=True)
        )(x_tm, keep)
    ys_k = np.asarray(out[0])
    err = np.abs(ys_k - ys_ref).max()
    assert err < INTERPRET_STRICT_ATOL, (
        f"T={t}: interpret-mode kernel diverges from scan by {err:.2e} at "
        f"matmul_precision=highest — a MATH bug, not tiling chaos"
    )


def test_envelope_constants_sane():
    """The chip gate's envelope must stay anchored to the r2u6 measurement
    (not silently loosened): monotone in T and within 2x of the recorded
    probe values."""
    import json
    from pathlib import Path

    measured = json.loads(
        (Path(__file__).resolve().parents[1] / "benchmarks"
         / "r2u6_tpu.json").read_text()
    )["divergence_vs_T"]
    prev = 0.0
    for t, bound in sorted(LSTM2_TRAIN_FWD_REL_ENVELOPE.items()):
        assert bound > prev, "envelope must grow with T (chaos signature)"
        prev = bound
        m = measured[str(t)]["rel_final"]
        assert m <= bound <= 2.4 * m, (t, m, bound)
