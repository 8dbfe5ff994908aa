"""Stacked LSTM/GRU as `lax.scan` with hoisted input projections and
chunked rematerialization for long sequences.

TPU re-design of the reference's cuDNN recurrences
(/root/reference/src/encoders.py:54-77,137-155).  The torch module calls
``nn.LSTM`` and lets cuDNN fuse the time loop; on TPU the idiomatic shape
is:

1. Hoist the input projection out of the recurrence: ``x @ W_ih`` for a
   whole (chunk of) timesteps is one big matmul that tiles onto the MXU.
2. ``lax.scan`` carries only the ``h @ W_hh`` part — a small ``(B, H) x
   (H, 4H)`` matmul per step — with a configurable unroll factor.
3. **Long sequences** (the reference's raw 48,000-sample waveform): a
   naive scan's backward stores every step's carry plus the full hoisted
   projection — measured 40.3 GB HBM for (B=32, T=48k, H=256), 2.5x the
   chip.  Instead the time axis is split into chunks; each chunk hoists
   its own input projection and is wrapped in ``jax.checkpoint``, so the
   backward stores only chunk-boundary carries (~MBs) and recomputes
   inside the chunk — the classic sqrt-T memory/compute trade.
4. Multi-layer stacking with inter-layer dropout (torch semantics:
   dropout on every layer's output except the last, only when
   num_layers > 1).

Gate math matches torch exactly (gate order i, f, g, o for LSTM; r, z, n
for GRU with the reset gate applied *inside* the candidate's hidden term),
and parameters use torch's U(-1/sqrt(H), 1/sqrt(H)) init so training
dynamics are comparable.
"""

from __future__ import annotations

# Trace-time switch for the Pallas inference kernel: callers that vmap a
# deterministic forward (ensembles, vmapped sweeps) must disable it — the
# manual-DMA kernel cannot lower under vmap on TPU (Mosaic requires
# trivial index maps for ANY-space operands; benchmarks/r2k_tpu.json).
_INFER_KERNEL_ENABLED = True


def set_infer_kernel_enabled(on: bool) -> bool:
    global _INFER_KERNEL_ENABLED
    prev = _INFER_KERNEL_ENABLED
    _INFER_KERNEL_ENABLED = bool(on)
    return prev


from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# sequences longer than this scan in remat'd chunks of _CHUNK steps
_HOIST_LIMIT = 2048
_CHUNK = 512


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


def _lstm_cell(carry, gates):
    h, c = carry
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _scan_rnn(
    x: jnp.ndarray,  # (B, T, D)
    init_carry,
    step_from_proj,  # (carry, proj_t, t) -> (carry, y_t)
    project,  # (chunk_x (S, B, D)) -> per-step projections (S, B, *)
    unroll: int,
    chunk_size,  # None = auto, 0 = never chunk, N = chunk when T > N
):
    """Shared scan driver: full-hoist for short T, chunked remat for long.

    Padding steps (t >= T) pass the carry through unchanged, so arbitrary
    T works with static chunk shapes.
    """
    batch, t_len, _ = x.shape
    x_tm = jnp.swapaxes(x, 0, 1)  # (T, B, D) time-major

    if chunk_size is None:  # auto: chunk only for genuinely long sequences
        chunk_size = _CHUNK if t_len > _HOIST_LIMIT else 0
    if chunk_size <= 0 or t_len <= chunk_size:
        proj = project(x_tm)  # (T, B, *)
        t_idx = jnp.arange(t_len)

        def step(carry, inp):
            proj_t, t = inp
            return step_from_proj(carry, proj_t, t)

        carry, ys = jax.lax.scan(step, init_carry, (proj, t_idx),
                                 unroll=unroll)
        return carry, jnp.swapaxes(ys, 0, 1)

    num_chunks = -(-t_len // chunk_size)
    t_pad = num_chunks * chunk_size
    if t_pad > t_len:
        x_tm = jnp.pad(x_tm, ((0, t_pad - t_len), (0, 0), (0, 0)))
    x_chunks = x_tm.reshape(num_chunks, chunk_size, batch, x.shape[-1])
    t_chunks = jnp.arange(t_pad).reshape(num_chunks, chunk_size)

    @jax.checkpoint
    def chunk_step(carry, inp):
        x_c, t_c = inp
        proj = project(x_c)  # hoisted matmul for this chunk (MXU)

        def step(carry, s):
            proj_t, t = s
            return step_from_proj(carry, proj_t, t)

        carry, ys = jax.lax.scan(step, carry, (proj, t_c), unroll=unroll)
        return carry, ys

    carry, ys = jax.lax.scan(chunk_step, init_carry, (x_chunks, t_chunks))
    ys = ys.reshape(t_pad, batch, -1)[:t_len]
    return carry, jnp.swapaxes(ys, 0, 1)


class LSTMLayer(nn.Module):
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    unroll: int = 2
    chunk_size: int | None = None  # None = auto (chunk when T > 2048)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, T, D) -> (outputs (B, T, H), final hidden (B, H))."""
        batch, t_len, in_dim = x.shape
        h_dim = self.hidden_dim
        k = 1.0 / jnp.sqrt(h_dim)
        w_ih = self.param("w_ih", _uniform_init(k), (in_dim, 4 * h_dim))
        w_hh = self.param("w_hh", _uniform_init(k), (h_dim, 4 * h_dim))
        b = self.param("b", _uniform_init(k), (4 * h_dim,))

        dtype = self.dtype
        x = x.astype(dtype)
        w_ih_c, w_hh_c, b_c = (
            w_ih.astype(dtype), w_hh.astype(dtype), b.astype(dtype)
        )

        def project(x_c):  # (S, B, D) -> (S, B, 4H)
            return x_c @ w_ih_c + b_c

        def step_from_proj(carry, ih_t, t):
            h, c = carry
            h_new, c_new = _lstm_cell((h, c), ih_t + h @ w_hh_c)
            valid = t < t_len
            h_new = jnp.where(valid, h_new, h)
            c_new = jnp.where(valid, c_new, c)
            return (h_new, c_new), h_new

        init = (
            jnp.zeros((batch, h_dim), dtype),
            jnp.zeros((batch, h_dim), dtype),
        )
        (h_final, _), ys = _scan_rnn(
            x, init, step_from_proj, project, self.unroll, self.chunk_size
        )
        return ys, h_final


class GRULayer(nn.Module):
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    unroll: int = 2
    chunk_size: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        batch, t_len, in_dim = x.shape
        h_dim = self.hidden_dim
        k = 1.0 / jnp.sqrt(h_dim)
        w_ih = self.param("w_ih", _uniform_init(k), (in_dim, 3 * h_dim))
        w_hh = self.param("w_hh", _uniform_init(k), (h_dim, 3 * h_dim))
        b_ih = self.param("b_ih", _uniform_init(k), (3 * h_dim,))
        b_hh = self.param("b_hh", _uniform_init(k), (3 * h_dim,))

        dtype = self.dtype
        x = x.astype(dtype)
        w_ih_c, w_hh_c = w_ih.astype(dtype), w_hh.astype(dtype)
        b_ih_c, b_hh_c = b_ih.astype(dtype), b_hh.astype(dtype)

        def project(x_c):  # (S, B, D) -> (S, B, 3H)
            return x_c @ w_ih_c + b_ih_c

        def step_from_proj(carry, ih_t, t):
            h = carry
            hh = h @ w_hh_c + b_hh_c
            xr, xz, xn = jnp.split(ih_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            # torch applies the reset gate to the hidden candidate term only
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            h_new = jnp.where(t < t_len, h_new, h)
            return h_new, h_new

        h0 = jnp.zeros((batch, h_dim), dtype)
        h_final, ys = _scan_rnn(
            x, h0, step_from_proj, project, self.unroll, self.chunk_size
        )
        return ys, h_final


class StackedRNN(nn.Module):
    """num_layers of LSTM/GRU with torch-style inter-layer dropout."""

    hidden_dim: int
    num_layers: int = 2
    cell_type: str = "lstm"  # 'lstm' | 'gru'
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    unroll: int = 2
    chunk_size: int | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, T, D) -> (all outputs of last layer, last layer's final h)."""
        layer_cls = {"lstm": LSTMLayer, "gru": GRULayer}[self.cell_type]
        h_final = None
        for layer_idx in range(self.num_layers):
            x, h_final = layer_cls(
                hidden_dim=self.hidden_dim,
                dtype=self.dtype,
                unroll=self.unroll,
                chunk_size=self.chunk_size,
                name=f"layer_{layer_idx}",
            )(x)
            if self.dropout > 0 and layer_idx < self.num_layers - 1:
                x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x, h_final


class _CellParams(nn.Module):
    """Parameter holder producing the same scope layout as LSTMLayer /
    GRULayer so FusedStackedRNN shares checkpoints with StackedRNN."""

    in_dim: int
    hidden_dim: int
    gates: int
    lstm: bool

    @nn.compact
    def __call__(self):
        k = 1.0 / jnp.sqrt(self.hidden_dim)
        out = {
            "w_ih": self.param("w_ih", _uniform_init(k),
                               (self.in_dim, self.gates * self.hidden_dim)),
            "w_hh": self.param("w_hh", _uniform_init(k),
                               (self.hidden_dim, self.gates * self.hidden_dim)),
        }
        if self.lstm:
            out["b"] = self.param("b", _uniform_init(k),
                                  (self.gates * self.hidden_dim,))
        else:
            out["b_ih"] = self.param("b_ih", _uniform_init(k),
                                     (self.gates * self.hidden_dim,))
            out["b_hh"] = self.param("b_hh", _uniform_init(k),
                                     (self.gates * self.hidden_dim,))
        return out


class FusedStackedRNN(nn.Module):
    """All layers advance inside ONE `lax.scan` step.

    The layer-by-layer form runs `num_layers` separate scans and
    materializes each layer's (B, T, H) output stream; at RAVDESS sizes the
    step is scan-*overhead* bound (~4% MXU utilization measured), so
    halving the number of scan trips and keeping the inter-layer
    activation in registers is the dominant lever.  Layer 0's input
    projection is still hoisted (one big MXU matmul over all timesteps);
    deeper layers project their input inside the step, where it fuses with
    the hh matmul.

    Inter-layer dropout keeps torch's exact semantics (independent mask
    per element per timestep) by precomputing all masks as (L-1, T, B, H)
    scan inputs.

    Numerically identical to StackedRNN (same parameter tree, tested).
    """

    hidden_dim: int
    num_layers: int = 2
    cell_type: str = "lstm"  # 'lstm' | 'gru'
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    unroll: int = 4
    # opt-in Pallas in-kernel recurrence for deterministic (inference)
    # calls; measured 1.3x over the tuned scan on v5e (ops/lstm_kernel.py)
    inference_kernel: bool = False
    # custom-VJP backward with hoisted weight gradients (2-layer LSTM)
    custom_vjp: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True,
        need_sequence: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        batch, t_len, in_dim = x.shape
        h_dim = self.hidden_dim
        gates = 4 if self.cell_type == "lstm" else 3
        k = 1.0 / jnp.sqrt(h_dim)
        dtype = self.dtype

        # parameter tree matches StackedRNN layer-for-layer (checkpoint
        # compatible: fused/layerwise are toggleable on the same weights)
        layers = []
        for li in range(self.num_layers):
            d_in = in_dim if li == 0 else h_dim
            holder = _CellParams(
                in_dim=d_in, hidden_dim=h_dim, gates=gates,
                lstm=self.cell_type == "lstm", name=f"layer_{li}",
            )
            layers.append(
                {key: value.astype(dtype) for key, value in holder().items()}
            )

        x = x.astype(dtype)

        if (
            self.inference_kernel
            and _INFER_KERNEL_ENABLED
            and deterministic
            and self.cell_type in ("lstm", "gru")
            and self.num_layers == 2
            and not self.is_initializing()
        ):
            from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
                gru2_infer_pallas,
                gru_infer_kernel_supported,
                kernel_supported,
                lstm2_infer_pallas,
            )

            if self.cell_type == "lstm":
                supported, infer_fn = kernel_supported, lstm2_infer_pallas
            else:
                supported, infer_fn = (gru_infer_kernel_supported,
                                       gru2_infer_pallas)
            if supported(batch, t_len, h_dim, self.num_layers):
                h_final = infer_fn(
                    x, layers[0], layers[1],
                    interpret=jax.default_backend() != "tpu",
                )
                # the kernel materialises no per-step outputs; returning
                # None (instead of a misleading (B,1,H) stand-in) makes any
                # caller that needs the sequence fail loudly rather than
                # silently consume the wrong shape
                return None, h_final

        x_tm = jnp.swapaxes(x, 0, 1)  # (T, B, D)
        if self.cell_type == "lstm":
            ih0 = x_tm @ layers[0]["w_ih"] + layers[0]["b"]
        else:
            ih0 = x_tm @ layers[0]["w_ih"] + layers[0]["b_ih"]

        use_dropout = (
            self.dropout > 0 and not deterministic and self.num_layers > 1
        )

        # 2-layer LSTM: route through the custom-VJP implementation whose
        # backward emits only the serial dgates chain and hoists every
        # weight-gradient contraction out of the loop (the XLA-autodiff
        # reverse scan was 4.4 ms vs 0.9 ms forward — ROADMAP.md table)
        if (
            self.custom_vjp
            and not (
                self.inference_kernel
                and deterministic
                and not self.is_initializing()
            )
        ):
            from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
                fused_gru,
                fused_lstm,
            )

            n_drop = self.num_layers - 1
            if use_dropout:
                rng = self.make_rng("dropout")
                keep_bt = jax.random.bernoulli(
                    rng, 1.0 - self.dropout,
                    (batch, t_len, n_drop, h_dim),
                ).astype(dtype) / (1.0 - self.dropout)
            else:
                keep_bt = jnp.ones((batch, t_len, n_drop, h_dim), dtype)
            if not need_sequence:
                # sequence cotangent is structurally zero: the dys-free
                # backward (ops/lstm_vjp.fused_{lstm,gru}_final) skips
                # streaming it; same None sentinel as the inference-kernel
                # path
                from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
                    fused_gru_final,
                    fused_lstm_final,
                )

                final_fn = (fused_lstm_final if self.cell_type == "lstm"
                            else fused_gru_final)
                h_final = final_fn(x, keep_bt, tuple(layers))
                return None, h_final
            fn = fused_lstm if self.cell_type == "lstm" else fused_gru
            ys, h_final = fn(x, keep_bt, tuple(layers))
            return ys, h_final
        if use_dropout:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.dropout,
                (t_len, self.num_layers - 1, batch, h_dim),
            ).astype(dtype) / (1.0 - self.dropout)
        else:
            keep = jnp.ones((t_len, 0, batch, h_dim), dtype)

        def gru_cell(h, ih_t, layer):
            hh = h @ layer["w_hh"] + layer["b_hh"]
            xr, xz, xn = jnp.split(ih_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            return (1.0 - z) * n + z * h

        def step(carry, inp):
            ih0_t, keep_t = inp
            new_carry = []
            inp_t = None
            for li, layer in enumerate(layers):
                if self.cell_type == "lstm":
                    h, c = carry[li]
                    gates_t = (
                        ih0_t if li == 0
                        else inp_t @ layer["w_ih"] + layer["b"]
                    ) + h @ layer["w_hh"]
                    h, c = _lstm_cell((h, c), gates_t)
                    new_carry.append((h, c))
                else:
                    h = carry[li]
                    ih_t = (
                        ih0_t if li == 0
                        else inp_t @ layer["w_ih"] + layer["b_ih"]
                    )
                    h = gru_cell(h, ih_t, layer)
                    new_carry.append(h)
                out = h
                if li < self.num_layers - 1 and use_dropout:
                    out = out * keep_t[li]
                inp_t = out
            return tuple(new_carry), inp_t

        if self.cell_type == "lstm":
            init = tuple(
                (jnp.zeros((batch, h_dim), dtype),
                 jnp.zeros((batch, h_dim), dtype))
                for _ in range(self.num_layers)
            )
        else:
            init = tuple(
                jnp.zeros((batch, h_dim), dtype)
                for _ in range(self.num_layers)
            )
        carry, ys = jax.lax.scan(step, init, (ih0, keep), unroll=self.unroll)
        h_final = carry[-1][0] if self.cell_type == "lstm" else carry[-1]
        return jnp.swapaxes(ys, 0, 1), h_final
