"""Pallas in-kernel LSTM recurrence (inference path).

`lax.scan` pays per-iteration dispatch overhead that dominates small-cell
recurrences (measured ~4% MXU utilization on the flagship encoder).  This
kernel runs the ENTIRE time loop inside one Pallas program:

* both layers' recurrence weights live in VMEM for the whole sequence;
* layer 0's hoisted input projections (T, B, 4H) stream from HBM in
  double-buffered chunks (compute overlaps the next chunk's DMA);
* the hidden/cell states never leave VMEM; only the final hidden state is
  written out.

Inference-only by design: the backward of an in-kernel scan would need a
second kernel and saved activations — for training, the XLA scan with
chunked remat (models/recurrent.py) is already the right trade, and a
custom_vjp wrapping this kernel would *recompute* the XLA forward anyway
(net slower).  Serving/eval throughput is where in-kernel recurrence pays.

Matches FusedStackedRNN(cell_type='lstm', num_layers=2, deterministic=True)
numerically (tested in interpret mode and on hardware).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _cell(h, c, gates):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _lstm2_kernel(
    ih0_hbm,  # (B, T_pad, 4H) in ANY/HBM — streamed (batch-major: no
    #           transpose needed; the chunk DMA is strided over B)
    w_hh0_ref,  # (H, 4H) VMEM
    w_ih1_ref,  # (H, 4H) VMEM
    b1_ref,  # (1, 4H) VMEM
    w_hh1_ref,  # (H, 4H) VMEM
    h_out_ref,  # (B, H) VMEM out
    *,
    t_len: int,
    chunk: int,
    full_unroll: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = h_out_ref.shape[0]
    h_dim = h_out_ref.shape[1]
    num_chunks = ih0_hbm.shape[1] // chunk

    def body(ih_buf, sem, state_buf):
        # state_buf: (4, B, H) = h0, c0, h1, c1
        state_buf[:] = jnp.zeros((4, batch, h_dim), jnp.float32)
        w_hh0 = w_hh0_ref[:]
        w_ih1 = w_ih1_ref[:]
        b1 = b1_ref[:]
        w_hh1 = w_hh1_ref[:]

        def dma(slot, chunk_idx):
            return pltpu.make_async_copy(
                ih0_hbm.at[:, pl.ds(chunk_idx * chunk, chunk)],
                ih_buf.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < num_chunks)
            def _():
                dma((ci + 1) % 2, ci + 1).start()

            dma(slot, ci).wait()

            def step(s, _):
                t = ci * chunk + s
                h0 = state_buf[0]
                c0 = state_buf[1]
                h1 = state_buf[2]
                c1 = state_buf[3]
                gates0 = ih_buf[slot, :, s] + jnp.dot(
                    h0, w_hh0, preferred_element_type=jnp.float32
                )
                h0n, c0n = _cell(h0, c0, gates0)
                gates1 = (
                    jnp.dot(h0n, w_ih1, preferred_element_type=jnp.float32)
                    + b1
                    + jnp.dot(h1, w_hh1, preferred_element_type=jnp.float32)
                )
                h1n, c1n = _cell(h1, c1, gates1)
                valid = t < t_len  # padded steps pass state through

                state_buf[0] = jnp.where(valid, h0n, h0)
                state_buf[1] = jnp.where(valid, c0n, c0)
                state_buf[2] = jnp.where(valid, h1n, h1)
                state_buf[3] = jnp.where(valid, c1n, c1)
                return 0

            # Mosaic supports only unroll=1 or full unroll inside kernels
            jax.lax.fori_loop(0, chunk, step, 0,
                              unroll=chunk if full_unroll else 1)
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)
        h_out_ref[:] = state_buf[2]

    gates4 = w_hh0_ref.shape[1]
    pl.run_scoped(
        body,
        ih_buf=pltpu.VMEM((2, batch, chunk, gates4), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
        state_buf=pltpu.VMEM((4, batch, h_dim), jnp.float32),
    )


def lstm2_infer_pallas(
    x: jnp.ndarray,  # (B, T, D)
    layer0: Dict[str, jnp.ndarray],  # w_ih (D,4H), w_hh (H,4H), b (4H,)
    layer1: Dict[str, jnp.ndarray],
    chunk: int = 32,
    full_unroll: bool = True,  # v5e: 0.706 ms vs 0.833 rolled (B32,T375,H256)
    interpret: bool = False,
) -> jnp.ndarray:
    """Final hidden state (B, H) of a 2-layer LSTM, recurrence in-kernel.

    Layer 0's input projection is hoisted to one XLA matmul; everything
    sequential runs inside the Pallas program.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, t_len, _ = x.shape
    h_dim = layer0["w_hh"].shape[0]

    # batch-major (B, T, 4H): no 50 MB time-major transpose; the kernel's
    # chunk DMA strides over the batch dimension instead
    ih0 = (
        x.astype(jnp.float32) @ layer0["w_ih"].astype(jnp.float32)
        + layer0["b"].astype(jnp.float32)
    )
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    if t_pad > t_len:
        ih0 = jnp.pad(ih0, ((0, 0), (0, t_pad - t_len), (0, 0)))

    kernel = functools.partial(_lstm2_kernel, t_len=t_len, chunk=chunk,
                               full_unroll=full_unroll)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, h_dim), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # HBM; streamed manually
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        ih0,
        layer0["w_hh"].astype(jnp.float32),
        layer1["w_ih"].astype(jnp.float32),
        layer1["b"].astype(jnp.float32).reshape(1, -1),
        layer1["w_hh"].astype(jnp.float32),
    )


def kernel_supported(batch: int, t_len: int, h_dim: int,
                     num_layers: int, chunk: int = 32) -> bool:
    """VMEM feasibility + shape constraints for the inference kernel."""
    if num_layers != 2:
        return False
    gates4 = 4 * h_dim
    vmem = (
        2 * chunk * batch * gates4 * 4  # double-buffered ih chunks
        + 3 * h_dim * gates4 * 4  # w_hh0, w_ih1, w_hh1
        + 4 * batch * h_dim * 4  # state
        + batch * h_dim * 4  # out
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and batch >= 8


# ---------------------------------------------------------------------------
# GRU inference: in-kernel 2-layer recurrence (twin of _lstm2_kernel)
# ---------------------------------------------------------------------------
#
# Round-4 verdict item 4: GRU is the fastest *training* family but served
# through the scan; serving rides this kernel exactly like the LSTM —
# same routing gate (FusedStackedRNN deterministic path), same
# batch-major streaming, final hidden only.


def _gru2_infer_kernel(
    ih0_hbm,  # (B, T_pad, 3H) ANY — hoisted layer-0 input projections
    w_hh0_ref,   # (H, 3H) VMEM
    b_hh0_ref,   # (1, 3H) VMEM
    w_ih1_ref,   # (H, 3H) VMEM
    b_ih1_ref,   # (1, 3H) VMEM
    w_hh1_ref,   # (H, 3H) VMEM
    b_hh1_ref,   # (1, 3H) VMEM
    h_out_ref,   # (B, H) VMEM out
    *,
    t_len: int,
    chunk: int,
    full_unroll: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = h_out_ref.shape[0]
    h_dim = h_out_ref.shape[1]
    num_chunks = ih0_hbm.shape[1] // chunk

    def body(ih_buf, sem, state_buf):
        # state_buf: (2, B, H) = h0, h1
        state_buf[:] = jnp.zeros((2, batch, h_dim), jnp.float32)
        w_hh0 = w_hh0_ref[:]
        b_hh0 = b_hh0_ref[:]
        w_ih1 = w_ih1_ref[:]
        b_ih1 = b_ih1_ref[:]
        w_hh1 = w_hh1_ref[:]
        b_hh1 = b_hh1_ref[:]

        def dma(slot, chunk_idx):
            return pltpu.make_async_copy(
                ih0_hbm.at[:, pl.ds(chunk_idx * chunk, chunk)],
                ih_buf.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < num_chunks)
            def _():
                dma((ci + 1) % 2, ci + 1).start()

            dma(slot, ci).wait()

            def step(s, _):
                t = ci * chunk + s
                h0 = state_buf[0]
                h1 = state_buf[1]
                h0n, *_ = _gru_step(h0, ih_buf[slot, :, s], w_hh0, b_hh0,
                                    h_dim)
                ih1 = jnp.dot(
                    h0n, w_ih1, preferred_element_type=jnp.float32
                ) + b_ih1
                h1n, *_ = _gru_step(h1, ih1, w_hh1, b_hh1, h_dim)
                valid = t < t_len  # padded steps pass state through
                state_buf[0] = jnp.where(valid, h0n, h0)
                state_buf[1] = jnp.where(valid, h1n, h1)
                return 0

            jax.lax.fori_loop(0, chunk, step, 0,
                              unroll=chunk if full_unroll else 1)
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)
        h_out_ref[:] = state_buf[1]

    gates3 = w_hh0_ref.shape[1]
    pl.run_scoped(
        body,
        ih_buf=pltpu.VMEM((2, batch, chunk, gates3), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
        state_buf=pltpu.VMEM((2, batch, h_dim), jnp.float32),
    )


def gru2_infer_pallas(
    x: jnp.ndarray,  # (B, T, D)
    layer0: Dict[str, jnp.ndarray],  # w_ih (D,3H), w_hh (H,3H), b_ih, b_hh
    layer1: Dict[str, jnp.ndarray],
    chunk: int = 32,
    full_unroll: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Final hidden state (B, H) of a 2-layer GRU, recurrence in-kernel.

    Layer 0's input projection is hoisted to one XLA matmul; everything
    sequential runs inside the Pallas program (see _lstm2_kernel).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, t_len, _ = x.shape
    h_dim = layer0["w_hh"].shape[0]

    ih0 = (
        x.astype(jnp.float32) @ layer0["w_ih"].astype(jnp.float32)
        + layer0["b_ih"].astype(jnp.float32)
    )
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    if t_pad > t_len:
        ih0 = jnp.pad(ih0, ((0, 0), (0, t_pad - t_len), (0, 0)))

    kernel = functools.partial(_gru2_infer_kernel, t_len=t_len, chunk=chunk,
                               full_unroll=full_unroll)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, h_dim), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # HBM; streamed manually
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        ih0,
        layer0["w_hh"].astype(jnp.float32),
        layer0["b_hh"].astype(jnp.float32).reshape(1, -1),
        layer1["w_ih"].astype(jnp.float32),
        layer1["b_ih"].astype(jnp.float32).reshape(1, -1),
        layer1["w_hh"].astype(jnp.float32),
        layer1["b_hh"].astype(jnp.float32).reshape(1, -1),
    )


def gru_infer_kernel_supported(batch: int, t_len: int, h_dim: int,
                               num_layers: int, chunk: int = 32) -> bool:
    """VMEM feasibility + shape constraints for the GRU inference kernel."""
    if num_layers != 2:
        return False
    gates3 = 3 * h_dim
    vmem = (
        2 * chunk * batch * gates3 * 4  # double-buffered ih chunks
        + 3 * h_dim * gates3 * 4  # w_hh0, w_ih1, w_hh1
        + 2 * batch * h_dim * 4  # state
        + batch * h_dim * 4  # out
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and batch >= 8


# ---------------------------------------------------------------------------
# Training backward: in-kernel reverse dgates chain (one layer per call)
# ---------------------------------------------------------------------------


def _cell_bwd(g, c_prev, dh_t, dc_t, h_dim):
    """dgates pre-activations + dc_prev for one LSTM step (fp32 VPU math)."""
    i = g[:, 0 * h_dim:1 * h_dim]
    f = g[:, 1 * h_dim:2 * h_dim]
    gg = g[:, 2 * h_dim:3 * h_dim]
    o = g[:, 3 * h_dim:4 * h_dim]
    si = jax.nn.sigmoid(i)
    sf = jax.nn.sigmoid(f)
    so = jax.nn.sigmoid(o)
    tg = jnp.tanh(gg)
    c = sf * c_prev + si * tg
    tc = jnp.tanh(c)
    dc = dc_t + dh_t * so * (1.0 - tc * tc)
    dgates = jnp.concatenate(
        [
            dc * tg * si * (1.0 - si),
            dc * c_prev * sf * (1.0 - sf),
            dc * si * (1.0 - tg * tg),
            dh_t * tc * so * (1.0 - so),
        ],
        axis=-1,
    )
    return dgates, dc * sf


def _lstm_bwd_kernel(
    g_hbm,  # (T_pad, B, 4H) ANY — gate pre-activations (res_dtype)
    c_hbm,  # (T_pad, B, H) ANY — c_prev series (res_dtype)
    dh_hbm,  # (T_pad, B, H) ANY — per-step incoming dh contributions
    dhf_ref,  # (B, H) VMEM — gradient wrt the final hidden state
    w_hh_t_ref,  # (4H, H) VMEM — transposed recurrence weights
    dg_hbm,  # (T_pad, B, 4H) ANY out — emitted dgates series
    *,
    t_len: int,
    chunk: int,
    tile_b: int,
    res_dtype=jnp.float32,
):
    """Reverse-time dgates chain, entire loop inside one Pallas program.

    The only serial work per step is VPU gate math + ONE (B,4H)x(4H,H)
    matmul (the dh carry); every weight-gradient contraction stays hoisted
    outside (ops/lstm_vjp.py).  Chunks of all three input series stream
    from HBM double-buffered; dgates chunks stream back out.  Padded steps
    (t >= t_len, processed FIRST in reverse order) pass the carry through.

    Batch rows are independent, so large batches run as a grid over
    ``tile_b``-row tiles (programs execute sequentially per core; each
    tile's stream buffers fit VMEM regardless of the total batch).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tile_b
    h_dim = dhf_ref.shape[1]
    num_chunks = g_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(g_buf, c_buf, dh_buf, out_buf, in_sem, out_sem, state_buf):
        # state_buf: (2, tile_b, H) = dh_carry, dc_carry
        state_buf[0] = dhf_ref[pl.ds(b0, tile_b)]
        state_buf[1] = jnp.zeros((batch, h_dim), jnp.float32)
        w_hh_t = w_hh_t_ref[:]

        def dma_in(slot, ci):
            start = ci * chunk
            return [
                pltpu.make_async_copy(
                    g_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    g_buf.at[slot],
                    in_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    c_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    c_buf.at[slot],
                    in_sem.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    dh_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    dh_buf.at[slot],
                    in_sem.at[slot, 2],
                ),
            ]

        def dma_out(slot, ci):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                dg_hbm.at[pl.ds(ci * chunk, chunk), pl.ds(b0, tile_b)],
                out_sem.at[slot],
            )

        for c in dma_in(0, num_chunks - 1):
            c.start()

        def chunk_body(k, _):
            ci = num_chunks - 1 - k
            slot = k % 2

            @pl.when(ci - 1 >= 0)
            def _():
                for cpy in dma_in((k + 1) % 2, ci - 1):
                    cpy.start()

            for cpy in dma_in(slot, ci):
                cpy.wait()
            # the out DMA that used this slot two chunks ago must be done
            @pl.when(k >= 2)
            def _():
                dma_out(slot, ci + 2).wait()

            def step(s_fwd, _):
                s = chunk - 1 - s_fwd
                t = ci * chunk + s
                dh_carry = state_buf[0]
                dc_carry = state_buf[1]
                dh_t = dh_carry + dh_buf[slot, s]
                # g/c may stream in bf16 (res_dtype); compute in f32
                dgates, dc_prev = _cell_bwd(
                    g_buf[slot, s].astype(jnp.float32),
                    c_buf[slot, s].astype(jnp.float32),
                    dh_t, dc_carry, h_dim
                )
                dh_prev = jnp.dot(
                    dgates, w_hh_t, preferred_element_type=jnp.float32
                )
                valid = t < t_len
                out_buf[slot, s] = jnp.where(valid, dgates, 0.0)
                state_buf[0] = jnp.where(valid, dh_prev, dh_carry)
                state_buf[1] = jnp.where(valid, dc_prev, dc_carry)
                return 0

            jax.lax.fori_loop(0, chunk, step, 0, unroll=1)
            dma_out(slot, ci).start()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)
        # drain the last (up to) two in-flight out DMAs
        @pl.when(num_chunks >= 2)
        def _():
            dma_out((num_chunks - 2) % 2, 1).wait()

        dma_out((num_chunks - 1) % 2, 0).wait()

    gates4 = w_hh_t_ref.shape[0]
    pl.run_scoped(
        body,
        g_buf=pltpu.VMEM((2, chunk, batch, gates4), res_dtype),
        c_buf=pltpu.VMEM((2, chunk, batch, h_dim), res_dtype),
        dh_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        out_buf=pltpu.VMEM((2, chunk, batch, gates4), jnp.float32),
        in_sem=pltpu.SemaphoreType.DMA((2, 3)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
        state_buf=pltpu.VMEM((2, batch, h_dim), jnp.float32),
    )


def lstm_bwd_chain_pallas(
    g_series: jnp.ndarray,  # (T, B, 4H) gate pre-activations
    c_prev_series: jnp.ndarray,  # (T, B, H)
    dh_series: jnp.ndarray,  # (T, B, H) per-step dh contributions
    dh_final: jnp.ndarray,  # (B, H)
    w_hh: jnp.ndarray,  # (H, 4H)
    chunk: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """dgates series (T, B, 4H) of one LSTM layer, reverse chain in-kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, batch, gates4 = g_series.shape
    if chunk is None:
        chunk = _pick_bwd_chunk(batch, gates4 // 4)
        if chunk == 0:
            # the picker proved no chunk fits the 12MB VMEM budget for
            # this (batch, H); dispatching anyway would build an
            # over-budget kernel.  Callers route through
            # bwd_kernel_supported; a direct call gets a clear error.
            raise ValueError(
                f"lstm_bwd_chain_pallas: no bwd chunk fits VMEM for "
                f"batch={batch}, hidden={gates4 // 4} — use the XLA scan "
                f"fallback (ops/lstm_vjp.py) for this geometry")
    h_dim = gates4 // 4
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    pad = t_pad - t_len
    if pad:
        g_series = jnp.pad(g_series, ((0, pad), (0, 0), (0, 0)))
        c_prev_series = jnp.pad(c_prev_series, ((0, pad), (0, 0), (0, 0)))
        dh_series = jnp.pad(dh_series, ((0, pad), (0, 0), (0, 0)))

    tile_b = _pick_tile_b(batch)
    # g/c_prev stream in their STORED dtype (bf16 residual streams halve
    # the read traffic; upcast happens in-register per step) — casting
    # here would materialize a full f32 copy in HBM and cost MORE than
    # the f32 path.  Other compute dtypes still normalize to f32.
    res_dtype = (g_series.dtype if g_series.dtype == jnp.bfloat16
                 else jnp.float32)
    kernel = functools.partial(_lstm_bwd_kernel, t_len=t_len, chunk=chunk,
                               tile_b=tile_b, res_dtype=res_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, gates4), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        interpret=interpret,
    )(
        g_series.astype(res_dtype),
        c_prev_series.astype(res_dtype),
        dh_series.astype(jnp.float32),
        dh_final.astype(jnp.float32),
        w_hh.astype(jnp.float32).T,
    )
    return out[:t_len]


def _pick_tile_b(batch: int) -> int:
    """Largest batch tile <= 32 that divides the batch (rows independent)."""
    if batch <= 32:
        return batch
    for tile in (32, 16, 8):
        if batch % tile == 0:
            return tile
    return batch


# Measured crossovers.  Round 2 (per-step dispatch, r2c_tpu.json): the
# kernels won only at batch <= 32.  Under the epoch-scan driver the
# picture changed (r2u_tpu.json + /tmp/r2u9): for f32 compute the tiled
# kernels win at EVERY measured batch (b64 +36%, b128 +27%, b256 +19%
# over the XLA scans), so the f32 cap is 256 (tested envelope).  With
# bf16 compute the XLA scans ride 2x-rate bf16 MXU passes while the
# kernels accumulate in f32 — there the scans win at large batch (b256
# bf16: 10.2k vs 14.0k, r2c) and the cap stays 32 (where the kernel
# measured no slower).  The LSTM train gates pick the cap from the
# input dtype; GRU/inference gates keep the conservative 32.
_AUTO_MAX_BATCH = 32
_AUTO_MAX_BATCH_F32 = 256

# HBM-streaming chunk lengths.  Tuned on v5e at B=32/T=375/H=256: the
# ISOLATED bwd chain prefers 16 (1.19 vs 1.65 ms, r2i_tpu.json) but the
# FULL train step prefers 8 (11,162 vs 11,019 clips/s, r2j_tpu.json) —
# overlap with the surrounding step changes the optimum, and full-step
# evidence wins.  Module-level so benchmarks can A/B; read at trace time.
BWD_CHUNK = 8
FWD_CHUNK = 4

# Full chunk-loop unroll for the TRAINING kernels (the inference kernel
# already defaults to it: 0.706 vs 0.833 ms rolled).  On-chip A/B
# (benchmarks/r2o_tpu.json): fwd unroll 1.60 -> 1.53 ms isolated and
# +0.6% full step; bwd unroll measured slightly SLOWER (1.59 -> 1.62) —
# the reverse step's three matmuls already fill the issue pipeline.
FWD_TRAIN_UNROLL = True
BWD2_UNROLL = False


def _bwd_chunk_vmem(chunk: int, tile: int, h_dim: int) -> int:
    gates4 = 4 * h_dim
    return (
        2 * chunk * tile * (2 * gates4 + 2 * h_dim) * 4  # stream buffers
        + gates4 * h_dim * 4  # w_hh^T
        + 2 * tile * h_dim * 4  # carry state
    )


def _pick_bwd_chunk(batch: int, h_dim: int) -> int:
    """Largest chunk <= BWD_CHUNK whose buffers fit the VMEM budget.

    BWD_CHUNK=8 is the measured full-step optimum at h256 (r2j); larger
    hidden sizes (the big sweep config's h512) only fit with a shorter
    chunk — a shorter DMA pipeline beats falling back to the XLA scan.
    """
    tile = _pick_tile_b(batch)
    chunk = BWD_CHUNK
    while chunk >= 2 and _bwd_chunk_vmem(chunk, tile, h_dim) > 12 * 1024 * 1024:
        chunk //= 2
    return chunk if chunk >= 2 else 0


def bwd_kernel_supported(batch: int, t_len: int, h_dim: int,
                         chunk: int = None,
                         allow_large: bool = False,
                         f32_large: bool = False) -> bool:
    """VMEM feasibility + layout constraints for the backward kernel."""
    cap = _AUTO_MAX_BATCH_F32 if f32_large else _AUTO_MAX_BATCH
    if batch > cap and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    if chunk is None:
        chunk = _pick_bwd_chunk(batch, h_dim)
        if chunk == 0:
            return False
    return (
        _bwd_chunk_vmem(chunk, tile, h_dim) <= 12 * 1024 * 1024
        and h_dim % 128 == 0
        and t_len >= 1
    )


# ---------------------------------------------------------------------------
# Training forward: in-kernel 2-layer recurrence that STREAMS RESIDUALS out
# ---------------------------------------------------------------------------


def _lstm2_fwd_train_kernel(
    ih0_hbm,   # (T_pad, B, 4H) ANY — hoisted layer-0 input projections
    keep_hbm,  # (T_pad, B, H) ANY — inter-layer dropout keep mask
    w_hh0_ref,  # (H, 4H) VMEM
    w_ih1_ref,  # (H, 4H) VMEM
    b1_ref,     # (1, 4H) VMEM
    w_hh1_ref,  # (H, 4H) VMEM
    res_hbm,    # (T_pad, B, 12H) ANY out — packed [g0|g1|h0|h1|c0|c1]
    hf_ref,     # (B, H) VMEM out — final hidden of layer 1
    *,
    t_len: int,
    chunk: int,
    tile_b: int,
    full_unroll: bool,
):
    """Forward recurrence in one Pallas program, residuals streamed to HBM.

    The packed residual layout keeps ONE out-DMA per chunk; every lane
    offset is a multiple of H (>= 128), a legal Mosaic slice.  The
    backward (lstm_bwd_chain_pallas) consumes g/c_prev series; h_prev /
    x_l series are cheap XLA shifts of the h streams outside the kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tile_b
    h_dim = w_hh0_ref.shape[0]
    g4 = 4 * h_dim
    num_chunks = ih0_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(ih_buf, keep_buf, out_buf, in_sem, out_sem, state_buf):
        # state_buf: (4, B, H) = h0, c0, h1, c1
        state_buf[:] = jnp.zeros((4, batch, h_dim), jnp.float32)
        w_hh0 = w_hh0_ref[:]
        w_ih1 = w_ih1_ref[:]
        b1 = b1_ref[:]
        w_hh1 = w_hh1_ref[:]

        def dma_in(slot, ci):
            start = ci * chunk
            return [
                pltpu.make_async_copy(
                    ih0_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    ih_buf.at[slot], in_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    keep_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    keep_buf.at[slot], in_sem.at[slot, 1],
                ),
            ]

        def dma_out(slot, ci):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                res_hbm.at[pl.ds(ci * chunk, chunk), pl.ds(b0, tile_b)],
                out_sem.at[slot],
            )

        for cpy in dma_in(0, 0):
            cpy.start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < num_chunks)
            def _():
                for cpy in dma_in((ci + 1) % 2, ci + 1):
                    cpy.start()

            for cpy in dma_in(slot, ci):
                cpy.wait()

            @pl.when(ci >= 2)
            def _():
                dma_out(slot, ci - 2).wait()

            def step(s, _):
                t = ci * chunk + s
                h0 = state_buf[0]
                c0 = state_buf[1]
                h1 = state_buf[2]
                c1 = state_buf[3]
                gates0 = ih_buf[slot, s] + jnp.dot(
                    h0, w_hh0, preferred_element_type=jnp.float32
                )
                h0n, c0n = _cell(h0, c0, gates0)
                x1 = h0n * keep_buf[slot, s]
                gates1 = (
                    jnp.dot(x1, w_ih1, preferred_element_type=jnp.float32)
                    + b1
                    + jnp.dot(h1, w_hh1, preferred_element_type=jnp.float32)
                )
                h1n, c1n = _cell(h1, c1, gates1)
                valid = t < t_len
                out_buf[slot, s, :, 0 * g4:1 * g4] = gates0
                out_buf[slot, s, :, 1 * g4:2 * g4] = gates1
                off = 2 * g4
                out_buf[slot, s, :, off:off + h_dim] = h0n
                out_buf[slot, s, :, off + h_dim:off + 2 * h_dim] = h1n
                out_buf[slot, s, :, off + 2 * h_dim:off + 3 * h_dim] = c0n
                out_buf[slot, s, :, off + 3 * h_dim:off + 4 * h_dim] = c1n
                state_buf[0] = jnp.where(valid, h0n, h0)
                state_buf[1] = jnp.where(valid, c0n, c0)
                state_buf[2] = jnp.where(valid, h1n, h1)
                state_buf[3] = jnp.where(valid, c1n, c1)
                return 0

            # Mosaic supports only unroll=1 or full unroll inside kernels
            jax.lax.fori_loop(0, chunk, step, 0,
                              unroll=chunk if full_unroll else 1)
            dma_out(slot, ci).start()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        @pl.when(num_chunks >= 2)
        def _():
            dma_out(num_chunks % 2, num_chunks - 2).wait()

        dma_out((num_chunks - 1) % 2, num_chunks - 1).wait()
        # this grid program's batch-tile slice of the final hidden state
        hf_ref[pl.ds(b0, tile_b)] = state_buf[2]

    pl.run_scoped(
        body,
        ih_buf=pltpu.VMEM((2, chunk, batch, g4), jnp.float32),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        out_buf=pltpu.VMEM((2, chunk, batch, 12 * h_dim), jnp.float32),
        in_sem=pltpu.SemaphoreType.DMA((2, 2)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
        state_buf=pltpu.VMEM((4, batch, h_dim), jnp.float32),
    )


def lstm2_train_fwd_pallas(
    x_tm: jnp.ndarray,    # (T, B, D) time-major input
    keep_tm: jnp.ndarray,  # (T, B, H) inter-layer keep mask
    layer0: Dict[str, jnp.ndarray],
    layer1: Dict[str, jnp.ndarray],
    chunk: int = None,
    interpret: bool = False,
    full_unroll: bool = None,
):
    """2-layer LSTM forward with residual streaming.

    Returns ``(ys, h_final, g0, g1, h0_new, c0_new, c1_new)`` — everything
    the hoisted-gradient backward needs (h_prev/c_prev series are shifts
    of the *_new series; layer-1 input series is h0_new * keep).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = FWD_CHUNK if chunk is None else chunk
    full_unroll = FWD_TRAIN_UNROLL if full_unroll is None else full_unroll
    t_len, batch, _ = x_tm.shape
    h_dim = layer0["w_hh"].shape[0]
    g4 = 4 * h_dim

    ih0 = (
        x_tm.astype(jnp.float32) @ layer0["w_ih"].astype(jnp.float32)
        + layer0["b"].astype(jnp.float32)
    )
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    pad = t_pad - t_len
    keep = keep_tm.astype(jnp.float32)
    if pad:
        ih0 = jnp.pad(ih0, ((0, pad), (0, 0), (0, 0)))
        keep = jnp.pad(keep, ((0, pad), (0, 0), (0, 0)))

    tile_b = _pick_tile_b(batch)
    kernel = functools.partial(_lstm2_fwd_train_kernel, t_len=t_len,
                               chunk=chunk, tile_b=tile_b,
                               full_unroll=full_unroll)
    res, h_final = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, 12 * h_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, h_dim), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        ih0,
        keep,
        layer0["w_hh"].astype(jnp.float32),
        layer1["w_ih"].astype(jnp.float32),
        layer1["b"].astype(jnp.float32).reshape(1, -1),
        layer1["w_hh"].astype(jnp.float32),
    )
    res = res[:t_len]
    g0 = res[:, :, 0 * g4:1 * g4]
    g1 = res[:, :, 1 * g4:2 * g4]
    off = 2 * g4
    h0_new = res[:, :, off:off + h_dim]
    ys = res[:, :, off + h_dim:off + 2 * h_dim]
    c0_new = res[:, :, off + 2 * h_dim:off + 3 * h_dim]
    c1_new = res[:, :, off + 3 * h_dim:off + 4 * h_dim]
    return ys, h_final, g0, g1, h0_new, c0_new, c1_new


def fwd_kernel_supported(batch: int, t_len: int, h_dim: int,
                         n_layers: int, chunk: int = None,
                         allow_large: bool = False,
                         f32_large: bool = False) -> bool:
    chunk = FWD_CHUNK if chunk is None else chunk
    cap = _AUTO_MAX_BATCH_F32 if f32_large else _AUTO_MAX_BATCH
    if batch > cap and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if n_layers != 2 or batch % tile != 0 or tile < 8:
        return False
    vmem = (
        2 * chunk * tile * (4 * h_dim + h_dim + 12 * h_dim) * 4  # streams
        + 3 * h_dim * 4 * h_dim * 4  # weights
        + 4 * tile * h_dim * 4
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1


# ---------------------------------------------------------------------------
# Training forward, ONE layer per call: the any-depth / large-H route
# ---------------------------------------------------------------------------
#
# The fused 2-layer kernels above cannot serve the reference's big sweep
# config (LSTM x3, hidden 512 — /root/reference/run.slurm geometry, the
# model behind every BASELINE.md number): 3 layers don't fit their
# hardcoded structure and h512 blows their VMEM gates.  But a stacked
# LSTM forward factors cleanly by LAYER: layer l's entire time loop
# depends only on layer l-1's full hidden series, so L sequential
# single-layer kernel launches cover any depth, each holding just ONE
# w_hh in VMEM (4 MB at h512).  The input projection x_l @ W_ih + b is
# hoisted to one full-occupancy XLA matmul between launches.
#
# r4b measured the XLA scan forward at 2x its serial-matmul floor at
# b32 f32 h512: the gap is residual stores and per-step loop overhead
# that the double-buffered DMA walk overlaps behind the MXU.


def _pick_fwd1_chunk(batch: int, h_dim: int) -> int:
    """Largest chunk whose stream buffers + weights fit the VMEM budget."""
    tile = _pick_tile_b(batch)
    for chunk in (16, 8, 4, 2):
        vmem = (
            2 * chunk * tile * (4 * h_dim + 4 * h_dim + 2 * h_dim) * 4
            + h_dim * 4 * h_dim * 4  # w_hh
            + 2 * tile * h_dim * 4  # carry state
        )
        if vmem <= 12 * 1024 * 1024:
            return chunk
    return 0


def fwd1_kernel_supported(batch: int, t_len: int, h_dim: int,
                          allow_large: bool = False,
                          f32_large: bool = False) -> bool:
    cap = _AUTO_MAX_BATCH_F32 if f32_large else _AUTO_MAX_BATCH
    if batch > cap and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    return (
        _pick_fwd1_chunk(batch, h_dim) > 0
        and h_dim % 128 == 0
        and t_len >= 1
    )


def _lstm1_fwd_train_kernel(
    ih_hbm,    # (T_pad, B, 4H) ANY — hoisted input projections (x@W_ih+b)
    w_hh_ref,  # (H, 4H) VMEM
    g_hbm,     # (T_pad, B, 4H) ANY out — gate pre-activations (res_dtype)
    hp_hbm,    # (T_pad, B, H) ANY out — h_prev series (state BEFORE step t)
    cp_hbm,    # (T_pad, B, H) ANY out — c_prev series (res_dtype)
    hf_ref,    # (B, 2H) VMEM out — [h_final | c_final]
    *,
    t_len: int,
    chunk: int,
    tile_b: int,
    full_unroll: bool,
    res_dtype=jnp.float32,
):
    """Single-layer forward recurrence, residuals streamed to HBM.

    Emits exactly what the hoisted-gradient backward consumes: the gate
    pre-activation series (reverse chain), h_prev (dW_hh contraction) and
    c_prev (cell backward) — no post-kernel shifts.  The caller rebuilds
    h_new as h_prev shifted by one plus the final (a lane-free view).

    ``res_dtype`` applies to the backward-only streams g and c_prev
    (bf16 halves the dominant store traffic — the kernel is DMA-bound at
    h512: ~0.99 us/step of stream vs ~0.68 us of MXU); h_prev stays f32
    because the caller rebuilds the next layer's INPUT from it, keeping
    the forward numerics exact (same contract as the fused route's
    final_only bf16 gate, r3g).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tile_b
    h_dim = w_hh_ref.shape[0]
    num_chunks = ih_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(ih_buf, g_buf, hp_buf, cp_buf, in_sem, out_sem, state_buf):
        # state_buf: (2, B, H) = h, c
        state_buf[:] = jnp.zeros((2, batch, h_dim), jnp.float32)
        w_hh = w_hh_ref[:]

        def dma_in(slot, ci):
            return pltpu.make_async_copy(
                ih_hbm.at[pl.ds(ci * chunk, chunk), pl.ds(b0, tile_b)],
                ih_buf.at[slot],
                in_sem.at[slot],
            )

        def dma_out(slot, ci):
            row = pl.ds(ci * chunk, chunk)
            cols = pl.ds(b0, tile_b)
            return [
                pltpu.make_async_copy(
                    g_buf.at[slot], g_hbm.at[row, cols], out_sem.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    hp_buf.at[slot], hp_hbm.at[row, cols],
                    out_sem.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    cp_buf.at[slot], cp_hbm.at[row, cols],
                    out_sem.at[slot, 2],
                ),
            ]

        dma_in(0, 0).start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < num_chunks)
            def _():
                dma_in((ci + 1) % 2, ci + 1).start()

            dma_in(slot, ci).wait()

            @pl.when(ci >= 2)
            def _():
                for cpy in dma_out(slot, ci - 2):
                    cpy.wait()

            def step(s, _):
                t = ci * chunk + s
                h = state_buf[0]
                c = state_buf[1]
                gates = ih_buf[slot, s] + jnp.dot(
                    h, w_hh, preferred_element_type=jnp.float32
                )
                h_new, c_new = _cell(h, c, gates)
                g_buf[slot, s] = gates.astype(res_dtype)
                hp_buf[slot, s] = h
                cp_buf[slot, s] = c.astype(res_dtype)
                valid = t < t_len  # padded steps pass state through
                state_buf[0] = jnp.where(valid, h_new, h)
                state_buf[1] = jnp.where(valid, c_new, c)
                return 0

            jax.lax.fori_loop(0, chunk, step, 0,
                              unroll=chunk if full_unroll else 1)
            for cpy in dma_out(slot, ci):
                cpy.start()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        @pl.when(num_chunks >= 2)
        def _():
            for cpy in dma_out(num_chunks % 2, num_chunks - 2):
                cpy.wait()

        for cpy in dma_out((num_chunks - 1) % 2, num_chunks - 1):
            cpy.wait()
        hf_ref[pl.ds(b0, tile_b), :h_dim] = state_buf[0]
        hf_ref[pl.ds(b0, tile_b), h_dim:] = state_buf[1]

    gates4 = w_hh_ref.shape[1]
    pl.run_scoped(
        body,
        ih_buf=pltpu.VMEM((2, chunk, batch, gates4), jnp.float32),
        g_buf=pltpu.VMEM((2, chunk, batch, gates4), res_dtype),
        hp_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        cp_buf=pltpu.VMEM((2, chunk, batch, h_dim), res_dtype),
        in_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2, 3)),
        state_buf=pltpu.VMEM((2, batch, h_dim), jnp.float32),
    )


def lstm1_train_fwd_pallas(
    ih: jnp.ndarray,    # (T, B, 4H) hoisted input projections (x@W_ih+b)
    w_hh: jnp.ndarray,  # (H, 4H)
    chunk: int = None,
    interpret: bool = False,
    full_unroll: bool = None,
    res_dtype=jnp.float32,
):
    """One LSTM layer's forward over all T, residual series streamed out.

    Returns ``(g_series, h_prev_series, c_prev_series, finals)`` with
    finals ``(B, 2H) = [h_final | c_final]``; series are (T, B, ·).
    ``res_dtype`` (float32|bfloat16) applies to g and c_prev — the
    backward-only streams; h_prev and finals stay f32 (forward-exact).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, batch, gates4 = ih.shape
    h_dim = gates4 // 4
    chunk = _pick_fwd1_chunk(batch, h_dim) if chunk is None else chunk
    full_unroll = FWD_TRAIN_UNROLL if full_unroll is None else full_unroll
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    if t_pad > t_len:
        ih = jnp.pad(ih, ((0, t_pad - t_len), (0, 0), (0, 0)))

    tile_b = _pick_tile_b(batch)
    kernel = functools.partial(_lstm1_fwd_train_kernel, t_len=t_len,
                               chunk=chunk, tile_b=tile_b,
                               full_unroll=full_unroll,
                               res_dtype=res_dtype)
    g_s, hp_s, cp_s, finals = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, gates4), res_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), res_dtype),
            jax.ShapeDtypeStruct((batch, 2 * h_dim), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        ih.astype(jnp.float32),
        w_hh.astype(jnp.float32),
    )
    return g_s[:t_len], hp_s[:t_len], cp_s[:t_len], finals


# ---------------------------------------------------------------------------
# GRU training backward: in-kernel reverse chain (one layer per call)
# ---------------------------------------------------------------------------


def _gru_cell_bwd_k(dh_t, h_prev, r, z, n, hn):
    """GRU step backward (pre-activation gate grads); pure VPU math."""
    dz = dh_t * (h_prev - n)
    dn = dh_t * (1.0 - z)
    dh_direct = dh_t * z
    dn_pre = dn * (1.0 - n * n)
    dhn = dn_pre * r
    dr = dn_pre * hn
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dih = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    dhh = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
    return dih, dhh, dh_direct


def _gru_bwd_kernel(
    res_hbm,  # (T_pad, B, 5H) ANY — packed [h_prev|r|z|n|hn]
    dh_hbm,   # (T_pad, B, H) ANY — per-step incoming dh contributions
    dhf_ref,  # (B, H) VMEM — gradient wrt the final hidden state
    w_hh_t_ref,  # (3H, H) VMEM — transposed recurrence weights
    dg_hbm,   # (T_pad, B, 6H) ANY out — packed [dih|dhh]
    *,
    t_len: int,
    chunk: int,
    tile_b: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tile_b
    h_dim = dhf_ref.shape[1]
    num_chunks = res_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(res_buf, dh_buf, out_buf, in_sem, out_sem, state_buf):
        state_buf[0] = dhf_ref[pl.ds(b0, tile_b)]
        w_hh_t = w_hh_t_ref[:]

        def dma_in(slot, ci):
            start = ci * chunk
            return [
                pltpu.make_async_copy(
                    res_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    res_buf.at[slot], in_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    dh_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    dh_buf.at[slot], in_sem.at[slot, 1],
                ),
            ]

        def dma_out(slot, ci):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                dg_hbm.at[pl.ds(ci * chunk, chunk), pl.ds(b0, tile_b)],
                out_sem.at[slot],
            )

        for cpy in dma_in(0, num_chunks - 1):
            cpy.start()

        def chunk_body(k, _):
            ci = num_chunks - 1 - k
            slot = k % 2

            @pl.when(ci - 1 >= 0)
            def _():
                for cpy in dma_in((k + 1) % 2, ci - 1):
                    cpy.start()

            for cpy in dma_in(slot, ci):
                cpy.wait()

            @pl.when(k >= 2)
            def _():
                dma_out(slot, ci + 2).wait()

            def step(s_fwd, _):
                s = chunk - 1 - s_fwd
                t = ci * chunk + s
                dh_carry = state_buf[0]
                res_t = res_buf[slot, s]
                h_prev = res_t[:, 0 * h_dim:1 * h_dim]
                r = res_t[:, 1 * h_dim:2 * h_dim]
                z = res_t[:, 2 * h_dim:3 * h_dim]
                n = res_t[:, 3 * h_dim:4 * h_dim]
                hn = res_t[:, 4 * h_dim:5 * h_dim]
                dh_t = dh_carry + dh_buf[slot, s]
                dih, dhh, dh_direct = _gru_cell_bwd_k(dh_t, h_prev, r, z,
                                                      n, hn)
                dh_prev = dh_direct + jnp.dot(
                    dhh, w_hh_t, preferred_element_type=jnp.float32
                )
                valid = t < t_len
                out_buf[slot, s, :, 0:3 * h_dim] = jnp.where(valid, dih, 0.0)
                out_buf[slot, s, :, 3 * h_dim:6 * h_dim] = jnp.where(
                    valid, dhh, 0.0
                )
                state_buf[0] = jnp.where(valid, dh_prev, dh_carry)
                return 0

            jax.lax.fori_loop(0, chunk, step, 0, unroll=1)
            dma_out(slot, ci).start()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        @pl.when(num_chunks >= 2)
        def _():
            dma_out((num_chunks - 2) % 2, 1).wait()

        dma_out((num_chunks - 1) % 2, 0).wait()

    pl.run_scoped(
        body,
        res_buf=pltpu.VMEM((2, chunk, batch, 5 * h_dim), jnp.float32),
        dh_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        out_buf=pltpu.VMEM((2, chunk, batch, 6 * h_dim), jnp.float32),
        in_sem=pltpu.SemaphoreType.DMA((2, 2)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
        state_buf=pltpu.VMEM((1, batch, h_dim), jnp.float32),
    )


def gru_bwd_chain_pallas(
    h_prev_s: jnp.ndarray,  # (T, B, H)
    r_s: jnp.ndarray,
    z_s: jnp.ndarray,
    n_s: jnp.ndarray,
    hn_s: jnp.ndarray,
    dh_series: jnp.ndarray,  # (T, B, H)
    dh_final: jnp.ndarray,   # (B, H)
    w_hh: jnp.ndarray,       # (H, 3H)
    chunk: int = 8,
    interpret: bool = False,
):
    """(dih_series, dhh_series) of one GRU layer, reverse chain in-kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, batch, h_dim = h_prev_s.shape
    res = jnp.concatenate(
        [h_prev_s, r_s, z_s, n_s, hn_s], axis=-1
    ).astype(jnp.float32)
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    pad = t_pad - t_len
    dh = dh_series.astype(jnp.float32)
    if pad:
        res = jnp.pad(res, ((0, pad), (0, 0), (0, 0)))
        dh = jnp.pad(dh, ((0, pad), (0, 0), (0, 0)))

    tile_b = _pick_tile_b(batch)
    kernel = functools.partial(_gru_bwd_kernel, t_len=t_len, chunk=chunk,
                               tile_b=tile_b)
    out = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, 6 * h_dim),
                                       jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        interpret=interpret,
    )(
        res,
        dh,
        dh_final.astype(jnp.float32),
        w_hh.astype(jnp.float32).T,
    )
    out = out[:t_len]
    return out[:, :, :3 * h_dim], out[:, :, 3 * h_dim:]


def gru_bwd_kernel_supported(batch: int, t_len: int, h_dim: int,
                             chunk: int = 8,
                             allow_large: bool = False) -> bool:
    if batch > _AUTO_MAX_BATCH and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    vmem = (
        2 * chunk * tile * (5 + 1 + 6) * h_dim * 4
        + 3 * h_dim * h_dim * 4
        + tile * h_dim * 4
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1


# ---------------------------------------------------------------------------
# GRU training forward: in-kernel 2-layer recurrence with residual streaming
# ---------------------------------------------------------------------------


def _gru_step(h, ih_t, w_hh, b_hh, h_dim):
    """One GRU step; returns (h_new, r, z, n, hn)."""
    hh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
    xr = ih_t[:, 0 * h_dim:1 * h_dim]
    xz = ih_t[:, 1 * h_dim:2 * h_dim]
    xn = ih_t[:, 2 * h_dim:3 * h_dim]
    hr = hh[:, 0 * h_dim:1 * h_dim]
    hz = hh[:, 1 * h_dim:2 * h_dim]
    hn = hh[:, 2 * h_dim:3 * h_dim]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h, r, z, n, hn


def _gru2_fwd_train_kernel(
    ih0_hbm,   # (T_pad, B, 3H) ANY — hoisted layer-0 input projections
    keep_hbm,  # (T_pad, B, H) ANY
    w_hh0_ref,  # (H, 3H) VMEM
    b_hh0_ref,  # (1, 3H) VMEM
    w_ih1_ref,  # (H, 3H) VMEM
    b_ih1_ref,  # (1, 3H) VMEM
    w_hh1_ref,  # (H, 3H) VMEM
    b_hh1_ref,  # (1, 3H) VMEM
    res_hbm,    # (T_pad, B, 10H) ANY out — [r0|z0|n0|hn0|h0 | r1|z1|n1|hn1|h1]
    hf_ref,     # (B, H) VMEM out
    *,
    t_len: int,
    chunk: int,
    tile_b: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tile_b
    h_dim = w_hh0_ref.shape[0]
    g3 = 3 * h_dim
    num_chunks = ih0_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(ih_buf, keep_buf, out_buf, in_sem, out_sem, state_buf):
        # state_buf: (2, B, H) = h0, h1
        state_buf[:] = jnp.zeros((2, batch, h_dim), jnp.float32)
        w_hh0 = w_hh0_ref[:]
        b_hh0 = b_hh0_ref[:]
        w_ih1 = w_ih1_ref[:]
        b_ih1 = b_ih1_ref[:]
        w_hh1 = w_hh1_ref[:]
        b_hh1 = b_hh1_ref[:]

        def dma_in(slot, ci):
            start = ci * chunk
            return [
                pltpu.make_async_copy(
                    ih0_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    ih_buf.at[slot], in_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    keep_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    keep_buf.at[slot], in_sem.at[slot, 1],
                ),
            ]

        def dma_out(slot, ci):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                res_hbm.at[pl.ds(ci * chunk, chunk), pl.ds(b0, tile_b)],
                out_sem.at[slot],
            )

        for cpy in dma_in(0, 0):
            cpy.start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < num_chunks)
            def _():
                for cpy in dma_in((ci + 1) % 2, ci + 1):
                    cpy.start()

            for cpy in dma_in(slot, ci):
                cpy.wait()

            @pl.when(ci >= 2)
            def _():
                dma_out(slot, ci - 2).wait()

            def step(s, _):
                t = ci * chunk + s
                h0 = state_buf[0]
                h1 = state_buf[1]
                h0n, r0, z0, n0, hn0 = _gru_step(
                    h0, ih_buf[slot, s], w_hh0, b_hh0, h_dim)
                x1 = h0n * keep_buf[slot, s]
                ih1 = jnp.dot(x1, w_ih1,
                              preferred_element_type=jnp.float32) + b_ih1
                h1n, r1, z1, n1, hn1 = _gru_step(h1, ih1, w_hh1, b_hh1,
                                                 h_dim)
                valid = t < t_len
                for j, val in enumerate((r0, z0, n0, hn0, h0n,
                                         r1, z1, n1, hn1, h1n)):
                    out_buf[slot, s, :, j * h_dim:(j + 1) * h_dim] = val
                state_buf[0] = jnp.where(valid, h0n, h0)
                state_buf[1] = jnp.where(valid, h1n, h1)
                return 0

            jax.lax.fori_loop(0, chunk, step, 0, unroll=1)
            dma_out(slot, ci).start()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        @pl.when(num_chunks >= 2)
        def _():
            dma_out(num_chunks % 2, num_chunks - 2).wait()

        dma_out((num_chunks - 1) % 2, num_chunks - 1).wait()
        hf_ref[pl.ds(b0, tile_b)] = state_buf[1]

    pl.run_scoped(
        body,
        ih_buf=pltpu.VMEM((2, chunk, batch, g3), jnp.float32),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        out_buf=pltpu.VMEM((2, chunk, batch, 10 * h_dim), jnp.float32),
        in_sem=pltpu.SemaphoreType.DMA((2, 2)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
        state_buf=pltpu.VMEM((2, batch, h_dim), jnp.float32),
    )


def gru2_train_fwd_pallas(
    x_tm: jnp.ndarray,    # (T, B, D)
    keep_tm: jnp.ndarray,  # (T, B, H)
    layer0: Dict[str, jnp.ndarray],  # w_ih (D,3H), w_hh (H,3H), b_ih, b_hh
    layer1: Dict[str, jnp.ndarray],
    chunk: int = 4,
    interpret: bool = False,
):
    """Returns (ys, h_final, per-layer (r, z, n, hn, h_new) series)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, batch, _ = x_tm.shape
    h_dim = layer0["w_hh"].shape[0]
    g3 = 3 * h_dim

    ih0 = (
        x_tm.astype(jnp.float32) @ layer0["w_ih"].astype(jnp.float32)
        + layer0["b_ih"].astype(jnp.float32)
    )
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    pad = t_pad - t_len
    keep = keep_tm.astype(jnp.float32)
    if pad:
        ih0 = jnp.pad(ih0, ((0, pad), (0, 0), (0, 0)))
        keep = jnp.pad(keep, ((0, pad), (0, 0), (0, 0)))

    tile_b = _pick_tile_b(batch)
    kernel = functools.partial(_gru2_fwd_train_kernel, t_len=t_len,
                               chunk=chunk, tile_b=tile_b)
    res, h_final = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, 10 * h_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, h_dim), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        ih0,
        keep,
        layer0["w_hh"].astype(jnp.float32),
        layer0["b_hh"].astype(jnp.float32).reshape(1, -1),
        layer1["w_ih"].astype(jnp.float32),
        layer1["b_ih"].astype(jnp.float32).reshape(1, -1),
        layer1["w_hh"].astype(jnp.float32),
        layer1["b_hh"].astype(jnp.float32).reshape(1, -1),
    )
    res = res[:t_len]
    layers = []
    for l in range(2):
        off = l * 5 * h_dim
        layers.append(tuple(
            res[:, :, off + j * h_dim:off + (j + 1) * h_dim]
            for j in range(5)
        ))  # (r, z, n, hn, h_new)
    ys = layers[1][4]
    return ys, h_final, layers


def gru_fwd_kernel_supported(batch: int, t_len: int, h_dim: int,
                             n_layers: int, chunk: int = 4,
                             allow_large: bool = False) -> bool:
    if batch > _AUTO_MAX_BATCH and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if n_layers != 2 or batch % tile != 0 or tile < 8:
        return False
    vmem = (
        2 * chunk * tile * (3 + 1 + 10) * h_dim * 4
        + 3 * h_dim * 3 * h_dim * 4
        + 2 * tile * h_dim * 4
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1


# ---------------------------------------------------------------------------
# Fused 2-layer LSTM training backward: BOTH layers' reverse chains in ONE
# pass over time.  The per-layer chains (lstm_bwd_chain_pallas, top-down)
# walk T twice; here the inter-layer hop dx1 = dgates1 @ w_ih1^T happens
# in-register inside the step, so the serial length is T, not 2T, and the
# (T, B, H) dx1/dh0 intermediate never touches HBM.
# ---------------------------------------------------------------------------

BWD2_CHUNK = 4


def _reverse_chunk_walk(num_chunks, chunk, dma_in, dma_out, step, unroll):
    """Double-buffered reverse walk over time chunks (shared skeleton).

    The one copy of the subtle pipelining logic used by every fused
    reverse kernel (LSTM legacy/residual-native, GRU): chunks are
    processed last-to-first with a one-chunk input prefetch, and a
    chunk's output DMA is only waited two iterations later so one write
    stays in flight while the next chunk computes.

    ``dma_in(slot, ci)`` / ``dma_out(slot, ci)`` build LISTS of async
    copies; ``step(slot, s, t)`` is the per-step reverse math (mutates
    the carry state scratch in place).
    """
    from jax.experimental import pallas as pl

    for cpy in dma_in(0, num_chunks - 1):
        cpy.start()

    def chunk_body(k, _):
        ci = num_chunks - 1 - k
        slot = k % 2

        @pl.when(ci - 1 >= 0)
        def _():
            for cpy in dma_in((k + 1) % 2, ci - 1):
                cpy.start()

        for cpy in dma_in(slot, ci):
            cpy.wait()

        @pl.when(k >= 2)
        def _():
            for cpy in dma_out(slot, ci + 2):
                cpy.wait()

        def sbody(s_fwd, _):
            s = chunk - 1 - s_fwd
            step(slot, s, ci * chunk + s)
            return 0

        # Mosaic supports only unroll=1 or full unroll inside kernels
        jax.lax.fori_loop(0, chunk, sbody, 0, unroll=unroll)
        for cpy in dma_out(slot, ci):
            cpy.start()
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    @pl.when(num_chunks >= 2)
    def _():
        for cpy in dma_out(num_chunks % 2, 1):
            cpy.wait()

    for cpy in dma_out((num_chunks - 1) % 2, 0):
        cpy.wait()


def _chunked_in_copies(srcs, bufs, in_sem, b0, tile_b, chunk):
    """dma_in builder: chunk ci of each (T_pad, B, ...) HBM src into the
    matching double-buffer slot, one semaphore per stream."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dma_in(slot, ci):
        start = ci * chunk
        return [
            pltpu.make_async_copy(
                src.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                buf.at[slot], in_sem.at[slot, i],
            )
            for i, (src, buf) in enumerate(zip(srcs, bufs))
        ]

    return dma_in


def _lstm2_step_fn(state_buf, keep_buf, dys_buf, w_hh1_t, w_ih1_t, w_hh0_t,
                   h_dim, t_len, read_res, write_dg):
    """Shared per-step reverse math for both fused LSTM backward kernels.

    Per step: two ``_cell_bwd`` VPU blocks + THREE (B,4H)x(4H,H) matmuls
    (dh1 carry, the inter-layer dx1 hop, dh0 carry).  Padded steps
    (t >= t_len, processed FIRST in reverse) pass carries through.
    ``read_res(slot, s) -> (g0, g1, cp0, cp1)`` and
    ``write_dg(slot, s, dgates0, dgates1)`` are the only parts that
    differ between the legacy (separate streams) and residual-native
    (packed buffer) kernels.  state_buf: (4, tile_b, H) = dh1, dc1,
    dh0, dc0.  ``dys_buf=None`` means the ys cotangent is structurally
    zero (final-hidden-only encoder path).
    """

    def step(slot, s, t):
        g0, g1, cp0, cp1 = read_res(slot, s)
        dh1_t = state_buf[0]
        if dys_buf is not None:
            dh1_t = dh1_t + dys_buf[slot, s]
        dgates1, dc1_prev = _cell_bwd(g1, cp1, dh1_t, state_buf[1], h_dim)
        dh1_prev = jnp.dot(
            dgates1, w_hh1_t, preferred_element_type=jnp.float32
        )
        dx1 = jnp.dot(
            dgates1, w_ih1_t, preferred_element_type=jnp.float32
        )
        dh0_t = state_buf[2] + dx1 * keep_buf[slot, s]
        dgates0, dc0_prev = _cell_bwd(g0, cp0, dh0_t, state_buf[3], h_dim)
        dh0_prev = jnp.dot(
            dgates0, w_hh0_t, preferred_element_type=jnp.float32
        )
        valid = t < t_len
        write_dg(
            slot, s,
            jnp.where(valid, dgates0, 0.0),
            jnp.where(valid, dgates1, 0.0),
        )
        state_buf[0] = jnp.where(valid, dh1_prev, state_buf[0])
        state_buf[1] = jnp.where(valid, dc1_prev, state_buf[1])
        state_buf[2] = jnp.where(valid, dh0_prev, state_buf[2])
        state_buf[3] = jnp.where(valid, dc0_prev, state_buf[3])

    return step


def _lstm2_bwd_kernel(
    *refs,
    t_len: int,
    chunk: int,
    tile_b: int,
    full_unroll: bool,
    has_dys: bool,
):
    """Reverse chains of BOTH layers, one serial walk over time.

    Per step: two `_cell_bwd` VPU blocks + THREE (B,4H)x(4H,H) matmuls
    (dh1 carry, the inter-layer dx1 hop, dh0 carry).  Input series stream
    from HBM double-buffered; the packed dgates chunk streams back out
    (lane offsets multiples of 4H — legal Mosaic slices).  Padded steps
    (t >= t_len, processed FIRST in reverse) pass carries through.

    ``has_dys=False`` drops the per-step dh-contribution stream entirely
    — the final-hidden-only encoder path (SequenceEncoder with
    lengths=None), where the ys cotangent is structurally zero and would
    otherwise be materialized and streamed as 12 MB of zeros per step.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_dys:
        (g0_hbm, g1_hbm, cp0_hbm, cp1_hbm, dys_hbm, keep_hbm, dhf_ref,
         w_hh1_t_ref, w_ih1_t_ref, w_hh0_t_ref, dg_hbm) = refs
    else:
        (g0_hbm, g1_hbm, cp0_hbm, cp1_hbm, keep_hbm, dhf_ref,
         w_hh1_t_ref, w_ih1_t_ref, w_hh0_t_ref, dg_hbm) = refs
        dys_hbm = None

    batch = tile_b
    h_dim = dhf_ref.shape[1]
    g4 = 4 * h_dim
    num_chunks = g0_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(g0_buf, g1_buf, cp0_buf, cp1_buf, keep_buf,
             out_buf, in_sem, out_sem, state_buf, dys_buf=None):
        # state_buf: (4, tile_b, H) = dh1, dc1, dh0, dc0
        state_buf[0] = dhf_ref[pl.ds(b0, tile_b)]
        state_buf[1] = jnp.zeros((batch, h_dim), jnp.float32)
        state_buf[2] = jnp.zeros((batch, h_dim), jnp.float32)
        state_buf[3] = jnp.zeros((batch, h_dim), jnp.float32)

        srcs = [g0_hbm, g1_hbm, cp0_hbm, cp1_hbm, keep_hbm]
        bufs = [g0_buf, g1_buf, cp0_buf, cp1_buf, keep_buf]
        if has_dys:
            srcs.append(dys_hbm)
            bufs.append(dys_buf)
        dma_in = _chunked_in_copies(srcs, bufs, in_sem, b0, tile_b, chunk)

        def dma_out(slot, ci):
            return [pltpu.make_async_copy(
                out_buf.at[slot],
                dg_hbm.at[pl.ds(ci * chunk, chunk), pl.ds(b0, tile_b)],
                out_sem.at[slot],
            )]

        def read_res(slot, s):
            return (g0_buf[slot, s], g1_buf[slot, s],
                    cp0_buf[slot, s], cp1_buf[slot, s])

        def write_dg(slot, s, dgates0, dgates1):
            # packed lane slices (offsets multiples of 4H — legal Mosaic)
            out_buf[slot, s, :, 0:g4] = dgates0
            out_buf[slot, s, :, g4:2 * g4] = dgates1

        step = _lstm2_step_fn(
            state_buf, keep_buf, dys_buf if has_dys else None,
            w_hh1_t_ref[:], w_ih1_t_ref[:], w_hh0_t_ref[:],
            h_dim, t_len, read_res, write_dg,
        )
        _reverse_chunk_walk(num_chunks, chunk, dma_in, dma_out, step,
                            unroll=chunk if full_unroll else 1)

    scratch = dict(
        g0_buf=pltpu.VMEM((2, chunk, batch, g4), jnp.float32),
        g1_buf=pltpu.VMEM((2, chunk, batch, g4), jnp.float32),
        cp0_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        cp1_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        out_buf=pltpu.VMEM((2, chunk, batch, 2 * g4), jnp.float32),
        in_sem=pltpu.SemaphoreType.DMA((2, 6 if has_dys else 5)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
        state_buf=pltpu.VMEM((4, batch, h_dim), jnp.float32),
    )
    if has_dys:
        scratch["dys_buf"] = pltpu.VMEM((2, chunk, batch, h_dim),
                                        jnp.float32)
    pl.run_scoped(body, **scratch)


def lstm2_bwd_chain_pallas(
    g0_series: jnp.ndarray,   # (T, B, 4H)
    g1_series: jnp.ndarray,   # (T, B, 4H)
    cp0_series: jnp.ndarray,  # (T, B, H)
    cp1_series: jnp.ndarray,  # (T, B, H)
    dys,                      # (T, B, H) dh contributions, or None (zero)
    keep: jnp.ndarray,        # (T, B, H) inter-layer keep mask
    dh_final: jnp.ndarray,    # (B, H)
    w_hh0: jnp.ndarray,       # (H, 4H)
    w_hh1: jnp.ndarray,       # (H, 4H)
    w_ih1: jnp.ndarray,       # (H, 4H)
    chunk: int = None,
    interpret: bool = False,
    full_unroll: bool = None,
):
    """Both layers' dgates series from ONE in-kernel reverse walk.

    Returns ``(dgates0, dgates1)``, each (T, B, 4H) — exactly what the
    hoisted weight-gradient contractions (ops/lstm_vjp.py) consume.
    ``dys=None`` means the sequence output carried no gradient (the
    final-hidden-only encoder path): the stream is omitted, not zeroed.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = BWD2_CHUNK if chunk is None else chunk
    full_unroll = BWD2_UNROLL if full_unroll is None else full_unroll
    t_len, batch, gates4 = g0_series.shape
    h_dim = gates4 // 4
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    pad = t_pad - t_len

    def padt(a):
        return jnp.pad(a, ((0, pad), (0, 0), (0, 0))) if pad else a

    f32 = jnp.float32
    tile_b = _pick_tile_b(batch)
    has_dys = dys is not None
    kernel = functools.partial(_lstm2_bwd_kernel, t_len=t_len, chunk=chunk,
                               tile_b=tile_b, full_unroll=full_unroll,
                               has_dys=has_dys)
    operands = [
        padt(g0_series.astype(f32)),
        padt(g1_series.astype(f32)),
        padt(cp0_series.astype(f32)),
        padt(cp1_series.astype(f32)),
    ]
    if has_dys:
        operands.append(padt(dys.astype(f32)))
    operands += [
        padt(keep.astype(f32)),
        dh_final.astype(f32),
        w_hh1.astype(f32).T,
        w_ih1.astype(f32).T,
        w_hh0.astype(f32).T,
    ]
    out = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, 2 * gates4), f32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (6 if has_dys else 5)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        interpret=interpret,
    )(*operands)
    out = out[:t_len]
    return out[:, :, :gates4], out[:, :, gates4:]


def bwd2_kernel_supported(batch: int, t_len: int, h_dim: int,
                          chunk: int = None,
                          allow_large: bool = False,
                          f32_large: bool = False) -> bool:
    """VMEM feasibility + layout constraints for the fused backward."""
    chunk = BWD2_CHUNK if chunk is None else chunk
    cap = _AUTO_MAX_BATCH_F32 if f32_large else _AUTO_MAX_BATCH
    if batch > cap and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    g4 = 4 * h_dim
    vmem = (
        2 * chunk * tile * (2 * g4 + 4 * h_dim + 2 * g4) * 4  # streams
        + 3 * g4 * h_dim * 4  # w_hh1^T, w_ih1^T, w_hh0^T
        + 4 * tile * h_dim * 4  # carry state
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1


# ---------------------------------------------------------------------------
# Fused 2-layer GRU training backward: both layers' reverse chains in ONE
# pass over time (see the LSTM twin above for the design rationale).
# ---------------------------------------------------------------------------

GRU_BWD2_CHUNK = 4

# Unlike the LSTM twin (+9.9% full step, r2n_tpu.json), the fused GRU
# reverse kernel measured SLOWER than the per-layer chains in the full
# GRU train step at every chunk (10.0-10.6k vs 11.9k clips/s,
# r2p_tpu.json) — the GRU cell's extra elementwise chains make the
# in-kernel dx1 hop serialize worse than the layered path's hoisted
# one-shot matmul.  Kept available (parity exact on chip) but off by
# default; flip for re-tuning on other geometries.
GRU_BWD2_ENABLED = False


def _gru2_bwd_kernel(
    res0_hbm,  # (T_pad, B, 5H) ANY — layer-0 packed [h_prev|r|z|n|hn]
    res1_hbm,  # (T_pad, B, 5H) ANY — layer-1 packed
    dys_hbm,   # (T_pad, B, H) ANY — per-step dh contributions (layer 1)
    keep_hbm,  # (T_pad, B, H) ANY — inter-layer dropout keep mask
    dhf_ref,      # (B, H) VMEM
    w_hh1_t_ref,  # (3H, H) VMEM
    w_ih1_t_ref,  # (3H, H) VMEM
    w_hh0_t_ref,  # (3H, H) VMEM
    dg_hbm,    # (T_pad, B, 12H) ANY out — packed [dih0|dhh0|dih1|dhh1]
    *,
    t_len: int,
    chunk: int,
    tile_b: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tile_b
    h_dim = dhf_ref.shape[1]
    g3 = 3 * h_dim
    num_chunks = res0_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def unpack(res_t):
        return (
            res_t[:, 0 * h_dim:1 * h_dim],
            res_t[:, 1 * h_dim:2 * h_dim],
            res_t[:, 2 * h_dim:3 * h_dim],
            res_t[:, 3 * h_dim:4 * h_dim],
            res_t[:, 4 * h_dim:5 * h_dim],
        )

    def body(res0_buf, res1_buf, dys_buf, keep_buf, out_buf,
             in_sem, out_sem, state_buf):
        # state_buf: (2, tile_b, H) = dh1_carry, dh0_carry
        state_buf[0] = dhf_ref[pl.ds(b0, tile_b)]
        state_buf[1] = jnp.zeros((batch, h_dim), jnp.float32)
        w_hh1_t = w_hh1_t_ref[:]
        w_ih1_t = w_ih1_t_ref[:]
        w_hh0_t = w_hh0_t_ref[:]

        dma_in = _chunked_in_copies(
            (res0_hbm, res1_hbm, dys_hbm, keep_hbm),
            (res0_buf, res1_buf, dys_buf, keep_buf),
            in_sem, b0, tile_b, chunk,
        )

        def dma_out(slot, ci):
            return [pltpu.make_async_copy(
                out_buf.at[slot],
                dg_hbm.at[pl.ds(ci * chunk, chunk), pl.ds(b0, tile_b)],
                out_sem.at[slot],
            )]

        def step(slot, s, t):
            h1p, r1, z1, n1, hn1 = unpack(res1_buf[slot, s])
            dh1_t = state_buf[0] + dys_buf[slot, s]
            dih1, dhh1, dh1_dir = _gru_cell_bwd_k(dh1_t, h1p, r1, z1,
                                                  n1, hn1)
            dh1_prev = dh1_dir + jnp.dot(
                dhh1, w_hh1_t, preferred_element_type=jnp.float32
            )
            dx1 = jnp.dot(
                dih1, w_ih1_t, preferred_element_type=jnp.float32
            )
            h0p, r0, z0, n0, hn0 = unpack(res0_buf[slot, s])
            dh0_t = state_buf[1] + dx1 * keep_buf[slot, s]
            dih0, dhh0, dh0_dir = _gru_cell_bwd_k(dh0_t, h0p, r0, z0,
                                                  n0, hn0)
            dh0_prev = dh0_dir + jnp.dot(
                dhh0, w_hh0_t, preferred_element_type=jnp.float32
            )
            valid = t < t_len
            out_buf[slot, s, :, 0:g3] = jnp.where(valid, dih0, 0.0)
            out_buf[slot, s, :, g3:2 * g3] = jnp.where(valid, dhh0, 0.0)
            out_buf[slot, s, :, 2 * g3:3 * g3] = jnp.where(valid, dih1,
                                                           0.0)
            out_buf[slot, s, :, 3 * g3:4 * g3] = jnp.where(valid, dhh1,
                                                           0.0)
            state_buf[0] = jnp.where(valid, dh1_prev, state_buf[0])
            state_buf[1] = jnp.where(valid, dh0_prev, state_buf[1])

        _reverse_chunk_walk(num_chunks, chunk, dma_in, dma_out, step,
                            unroll=1)

    pl.run_scoped(
        body,
        res0_buf=pltpu.VMEM((2, chunk, batch, 5 * h_dim), jnp.float32),
        res1_buf=pltpu.VMEM((2, chunk, batch, 5 * h_dim), jnp.float32),
        dys_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        out_buf=pltpu.VMEM((2, chunk, batch, 4 * g3), jnp.float32),
        in_sem=pltpu.SemaphoreType.DMA((2, 4)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
        state_buf=pltpu.VMEM((2, batch, h_dim), jnp.float32),
    )


def gru2_bwd_chain_pallas(
    res0,  # 5-tuple of (T, B, H): h_prev, r, z, n, hn — layer 0
    res1,  # 5-tuple — layer 1
    dys: jnp.ndarray,       # (T, B, H)
    keep: jnp.ndarray,      # (T, B, H)
    dh_final: jnp.ndarray,  # (B, H)
    w_hh0: jnp.ndarray,     # (H, 3H)
    w_hh1: jnp.ndarray,     # (H, 3H)
    w_ih1: jnp.ndarray,     # (H, 3H)
    chunk: int = None,
    interpret: bool = False,
):
    """((dih0, dhh0), (dih1, dhh1)) from ONE in-kernel reverse walk."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = GRU_BWD2_CHUNK if chunk is None else chunk
    t_len, batch, h_dim = res0[0].shape
    g3 = 3 * h_dim
    t_pad = ((t_len + chunk - 1) // chunk) * chunk
    pad = t_pad - t_len

    def padt(a):
        return jnp.pad(a, ((0, pad), (0, 0), (0, 0))) if pad else a

    f32 = jnp.float32
    packed0 = padt(jnp.concatenate(res0, axis=-1).astype(f32))
    packed1 = padt(jnp.concatenate(res1, axis=-1).astype(f32))
    tile_b = _pick_tile_b(batch)
    kernel = functools.partial(_gru2_bwd_kernel, t_len=t_len, chunk=chunk,
                               tile_b=tile_b)
    out = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, 4 * g3), f32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        interpret=interpret,
    )(
        packed0,
        packed1,
        padt(dys.astype(f32)),
        padt(keep.astype(f32)),
        dh_final.astype(f32),
        w_hh1.astype(f32).T,
        w_ih1.astype(f32).T,
        w_hh0.astype(f32).T,
    )
    out = out[:t_len]
    return (
        (out[:, :, 0:g3], out[:, :, g3:2 * g3]),
        (out[:, :, 2 * g3:3 * g3], out[:, :, 3 * g3:4 * g3]),
    )


def gru2_bwd_kernel_supported(batch: int, t_len: int, h_dim: int,
                              chunk: int = None,
                              allow_large: bool = False) -> bool:
    chunk = GRU_BWD2_CHUNK if chunk is None else chunk
    if batch > _AUTO_MAX_BATCH and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    vmem = (
        2 * chunk * tile * (5 + 5 + 1 + 1 + 12) * h_dim * 4  # streams
        + 3 * 3 * h_dim * h_dim * 4  # three (3H, H) weights
        + 2 * tile * h_dim * 4
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1


# ---------------------------------------------------------------------------
# Residual-native training path (round 3).
#
# The round-2 interface returned residuals as XLA slices of one packed
# kernel output, and the VJP then shift-copied the h/c series and
# re-padded everything for the backward kernel.  On-chip profiling
# (benchmarks/r3a_tpu.json + /tmp/r3a_trace) showed that post-processing
# as the #2 time sink of the whole train step: ~0.30 ms/step for the g0/g1
# slice alone (fusion.358, 195 MB of pure data movement) plus the shift /
# pad / x1 fusions — against a 1.70 ms device step.
#
# v2 removes every copy by emitting residuals EXACTLY as consumed:
#  * the per-step PRE-step state (h_prev/c_prev) is written directly —
#    the shift the VJP used to build is just "write the state you already
#    hold before updating it";
#  * streams are grouped by consumer: one packed [g0|g1|c0p|c1p] buffer
#    for the reverse-chain kernel (one DMA per chunk on both sides), and
#    separate h0_prev / h1_prev / x1 buffers for the hoisted
#    weight-gradient contractions;
#  * pad rows carry zeroed x1/keep and the backward zeroes padded dgates,
#    so contractions run over t_pad with no unpad slicing anywhere.
# ---------------------------------------------------------------------------

RES2_G0 = 0      # lane offsets (units of H) in the packed bwd-input buffer
RES2_G1 = 4
RES2_C0P = 8
RES2_C1P = 9
RES2_W = 10      # packed width in units of H

# v3 (gate-remat) packed layout: gates are NOT stored — the backward
# recomputes the pre-activations from the streamed h_prev/x series and
# the weights (docs/KERNELS.md "gate rematerialization").  Only the
# c_prev series survive (they cannot be recomputed without re-running
# the recurrence).
RES3_C0P = 0
RES3_C1P = 1
RES3_W = 2       # packed width in units of H


def _lstm2_fwd_res_kernel(
    ih0_hbm,    # (T_pad, B, 4H) ANY — hoisted layer-0 input projections
    keep_hbm,   # (T_pad, B, H) ANY — keep mask (zero at pad rows)
    w_hh0_ref,  # (H, 4H) VMEM
    w_ih1_ref,  # (H, 4H) VMEM
    b1_ref,     # (1, 4H) VMEM
    w_hh1_ref,  # (H, 4H) VMEM
    pk_hbm,     # (T_pad, B, 10H) ANY out — packed [g0|g1|c0_prev|c1_prev]
    h0p_hbm,    # (T_pad, B, H) ANY out — layer-0 h_prev series
    h1p_hbm,    # (T_pad, B, H) ANY out — layer-1 h_prev series
    x1_hbm,     # (T_pad, B, H) ANY out — layer-1 input series h0_new*keep
    fin_ref,    # (4, B, H) VMEM out — finals [h0, c0, h1, c1]
    *,
    t_len: int,
    chunk: int,
    tile_b: int,
    full_unroll: bool,
    res_dtype=jnp.float32,
    store_gates: bool = True,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tile_b
    h_dim = w_hh0_ref.shape[0]
    g4 = 4 * h_dim
    pk_w = (RES2_W if store_gates else RES3_W) * h_dim
    num_chunks = ih0_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(ih_buf, keep_buf, pk_buf, h0p_buf, h1p_buf, x1_buf,
             in_sem, out_sem, state_buf):
        state_buf[:] = jnp.zeros((4, batch, h_dim), jnp.float32)
        w_hh0 = w_hh0_ref[:]
        w_ih1 = w_ih1_ref[:]
        b1 = b1_ref[:]
        w_hh1 = w_hh1_ref[:]

        def dma_in(slot, ci):
            start = ci * chunk
            return [
                pltpu.make_async_copy(
                    ih0_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    ih_buf.at[slot], in_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    keep_hbm.at[pl.ds(start, chunk), pl.ds(b0, tile_b)],
                    keep_buf.at[slot], in_sem.at[slot, 1],
                ),
            ]

        def dma_out(slot, ci):
            row = pl.ds(ci * chunk, chunk)
            cols = pl.ds(b0, tile_b)
            return [
                pltpu.make_async_copy(
                    pk_buf.at[slot], pk_hbm.at[row, cols],
                    out_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    h0p_buf.at[slot], h0p_hbm.at[row, cols],
                    out_sem.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    h1p_buf.at[slot], h1p_hbm.at[row, cols],
                    out_sem.at[slot, 2],
                ),
                pltpu.make_async_copy(
                    x1_buf.at[slot], x1_hbm.at[row, cols],
                    out_sem.at[slot, 3],
                ),
            ]

        for cpy in dma_in(0, 0):
            cpy.start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < num_chunks)
            def _():
                for cpy in dma_in((ci + 1) % 2, ci + 1):
                    cpy.start()

            for cpy in dma_in(slot, ci):
                cpy.wait()

            @pl.when(ci >= 2)
            def _():
                for cpy in dma_out(slot, ci - 2):
                    cpy.wait()

            def step(s, _):
                t = ci * chunk + s
                h0 = state_buf[0]
                c0 = state_buf[1]
                h1 = state_buf[2]
                c1 = state_buf[3]
                gates0 = ih_buf[slot, s] + jnp.dot(
                    h0, w_hh0, preferred_element_type=jnp.float32
                )
                h0n, c0n = _cell(h0, c0, gates0)
                x1 = h0n * keep_buf[slot, s]
                gates1 = (
                    jnp.dot(x1, w_ih1, preferred_element_type=jnp.float32)
                    + b1
                    + jnp.dot(h1, w_hh1, preferred_element_type=jnp.float32)
                )
                h1n, c1n = _cell(h1, c1, gates1)
                valid = t < t_len
                # residuals as consumed: gate pre-activations + PRE-step
                # state (the "shift" is free here).  res_dtype=bfloat16
                # halves the dominant HBM stream; compute/carries stay f32
                if store_gates:
                    pk_buf[slot, s, :, RES2_G0 * h_dim:RES2_G1 * h_dim] = (
                        gates0.astype(res_dtype))
                    pk_buf[slot, s, :, RES2_G1 * h_dim:RES2_C0P * h_dim] = (
                        gates1.astype(res_dtype))
                    pk_buf[slot, s, :, RES2_C0P * h_dim:RES2_C1P * h_dim] = (
                        c0.astype(res_dtype))
                    pk_buf[slot, s, :, RES2_C1P * h_dim:RES2_W * h_dim] = (
                        c1.astype(res_dtype))
                else:
                    # v3: gates are rematerialized by the backward; only
                    # the c_prev series stream out (5H instead of 13H of
                    # residual writes per step)
                    pk_buf[slot, s, :, RES3_C0P * h_dim:RES3_C1P * h_dim] = (
                        c0.astype(res_dtype))
                    pk_buf[slot, s, :, RES3_C1P * h_dim:RES3_W * h_dim] = (
                        c1.astype(res_dtype))
                h0p_buf[slot, s] = h0.astype(res_dtype)
                h1p_buf[slot, s] = h1.astype(res_dtype)
                x1_buf[slot, s] = x1.astype(res_dtype)
                state_buf[0] = jnp.where(valid, h0n, h0)
                state_buf[1] = jnp.where(valid, c0n, c0)
                state_buf[2] = jnp.where(valid, h1n, h1)
                state_buf[3] = jnp.where(valid, c1n, c1)
                return 0

            jax.lax.fori_loop(0, chunk, step, 0,
                              unroll=chunk if full_unroll else 1)
            for cpy in dma_out(slot, ci):
                cpy.start()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        @pl.when(num_chunks >= 2)
        def _():
            for cpy in dma_out(num_chunks % 2, num_chunks - 2):
                cpy.wait()

        for cpy in dma_out((num_chunks - 1) % 2, num_chunks - 1):
            cpy.wait()
        fin_ref[0, pl.ds(b0, tile_b)] = state_buf[0]
        fin_ref[1, pl.ds(b0, tile_b)] = state_buf[1]
        fin_ref[2, pl.ds(b0, tile_b)] = state_buf[2]
        fin_ref[3, pl.ds(b0, tile_b)] = state_buf[3]

    pl.run_scoped(
        body,
        ih_buf=pltpu.VMEM((2, chunk, batch, g4), jnp.float32),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        pk_buf=pltpu.VMEM((2, chunk, batch, pk_w), res_dtype),
        h0p_buf=pltpu.VMEM((2, chunk, batch, h_dim), res_dtype),
        h1p_buf=pltpu.VMEM((2, chunk, batch, h_dim), res_dtype),
        x1_buf=pltpu.VMEM((2, chunk, batch, h_dim), res_dtype),
        in_sem=pltpu.SemaphoreType.DMA((2, 2)),
        out_sem=pltpu.SemaphoreType.DMA((2, 4)),
        state_buf=pltpu.VMEM((4, batch, h_dim), jnp.float32),
    )


def lstm2_train_fwd_residuals(
    x_tm: jnp.ndarray,     # (T, B, D) time-major input
    keep_tm: jnp.ndarray,  # (T, B, H) inter-layer keep mask
    layer0: Dict[str, jnp.ndarray],
    layer1: Dict[str, jnp.ndarray],
    chunk: int = None,
    interpret: bool = False,
    full_unroll: bool = None,
    res_dtype=jnp.float32,
    store_gates: bool = True,
):
    """Forward with consumer-shaped residuals (zero post-processing).

    Returns ``(packed, h0_prev, h1_prev, x1, keep_pad, finals, t_pad)``:
    ``packed`` (t_pad, B, 10H) = [g0|g1|c0_prev|c1_prev] for the fused
    reverse-chain kernel; ``h0_prev``/``h1_prev``/``x1`` (t_pad, B, H) for
    the hoisted weight-gradient contractions; ``keep_pad`` the zero-padded
    keep mask (reused by the backward); ``finals`` (4, B, H) =
    [h0, c0, h1, c1] at the last valid step.

    ``res_dtype=bfloat16`` streams the residual series (and nothing else:
    compute, carries and finals stay f32) at half the HBM traffic — the
    backward then consumes ROUNDED gates/state, an approximation bounded
    by bf16 eps on each residual element (opt-in,
    ``runtime.lstm_residual_dtype``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = FWD_CHUNK if chunk is None else chunk
    full_unroll = FWD_TRAIN_UNROLL if full_unroll is None else full_unroll
    t_len, batch, _ = x_tm.shape
    h_dim = layer0["w_hh"].shape[0]
    g4 = 4 * h_dim

    ih0 = (
        x_tm.astype(jnp.float32) @ layer0["w_ih"].astype(jnp.float32)
        + layer0["b"].astype(jnp.float32)
    )
    # pad to a multiple of BOTH chunk lengths so the backward re-pads
    # nothing (flagship T=372 with chunk 4: pad == 0)
    align = max(chunk, BWD2_CHUNK)
    t_pad = ((t_len + align - 1) // align) * align
    pad = t_pad - t_len
    keep = keep_tm.astype(jnp.float32)
    if pad:
        ih0 = jnp.pad(ih0, ((0, pad), (0, 0), (0, 0)))
        keep = jnp.pad(keep, ((0, pad), (0, 0), (0, 0)))

    tile_b = _pick_tile_b(batch)
    kernel = functools.partial(_lstm2_fwd_res_kernel, t_len=t_len,
                               chunk=chunk, tile_b=tile_b,
                               full_unroll=full_unroll, res_dtype=res_dtype,
                               store_gates=store_gates)
    f32 = jnp.float32
    pk_w = (RES2_W if store_gates else RES3_W) * h_dim
    packed, h0p, h1p, x1, finals = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, pk_w), res_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), res_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), res_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), res_dtype),
            jax.ShapeDtypeStruct((4, batch, h_dim), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        ih0,
        keep,
        layer0["w_hh"].astype(f32),
        layer1["w_ih"].astype(f32),
        layer1["b"].astype(f32).reshape(1, -1),
        layer1["w_hh"].astype(f32),
    )
    return packed, h0p, h1p, x1, keep, finals, t_pad


def res2_kernel_supported(batch: int, t_len: int, h_dim: int,
                          chunk: int = None,
                          allow_large: bool = False,
                          f32_large: bool = False) -> bool:
    """VMEM feasibility for the residual-native fwd kernel (13H streams)."""
    chunk = FWD_CHUNK if chunk is None else chunk
    cap = _AUTO_MAX_BATCH_F32 if f32_large else _AUTO_MAX_BATCH
    if batch > cap and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    vmem = (
        2 * chunk * tile * (5 * h_dim + (RES2_W + 3) * h_dim) * 4
        + 3 * h_dim * 4 * h_dim * 4
        + 4 * tile * h_dim * 4
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1


def _lstm2_bwd_res_kernel(
    pk_hbm,     # (T_pad, B, 10H) ANY — packed [g0|g1|c0_prev|c1_prev]
    keep_hbm,   # (T_pad, B, H) ANY
    *maybe_dys_and_rest,
    t_len: int,
    chunk: int,
    tile_b: int,
    full_unroll: bool,
    has_dys: bool,
):
    """v2 reverse chain reading the packed residual buffer directly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_dys:
        (dys_hbm, dhf_ref, w_hh1_t_ref, w_ih1_t_ref, w_hh0_t_ref,
         dg0_hbm, dg1_hbm) = maybe_dys_and_rest
    else:
        (dhf_ref, w_hh1_t_ref, w_ih1_t_ref, w_hh0_t_ref,
         dg0_hbm, dg1_hbm) = maybe_dys_and_rest
        dys_hbm = None

    batch = tile_b
    h_dim = dhf_ref.shape[1]
    g4 = 4 * h_dim
    num_chunks = pk_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(pk_buf, keep_buf, dg0_buf, dg1_buf, in_sem, out_sem,
             state_buf, dys_buf=None):
        state_buf[0] = dhf_ref[pl.ds(b0, tile_b)]
        state_buf[1] = jnp.zeros((batch, h_dim), jnp.float32)
        state_buf[2] = jnp.zeros((batch, h_dim), jnp.float32)
        state_buf[3] = jnp.zeros((batch, h_dim), jnp.float32)

        srcs = [pk_hbm, keep_hbm]
        bufs = [pk_buf, keep_buf]
        if has_dys:
            srcs.append(dys_hbm)
            bufs.append(dys_buf)
        dma_in = _chunked_in_copies(srcs, bufs, in_sem, b0, tile_b, chunk)

        def dma_out(slot, ci):
            row = pl.ds(ci * chunk, chunk)
            cols = pl.ds(b0, tile_b)
            return [
                pltpu.make_async_copy(
                    dg0_buf.at[slot], dg0_hbm.at[row, cols],
                    out_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    dg1_buf.at[slot], dg1_hbm.at[row, cols],
                    out_sem.at[slot, 1],
                ),
            ]

        def read_res(slot, s):
            # packed lane-slice reads (offsets multiples of H — legal);
            # upcast once per step when the stream is bf16 (astype is a
            # no-op at f32); all cell math stays f32
            f32 = jnp.float32
            return (
                pk_buf[slot, s, :,
                       RES2_G0 * h_dim:RES2_G1 * h_dim].astype(f32),
                pk_buf[slot, s, :,
                       RES2_G1 * h_dim:RES2_C0P * h_dim].astype(f32),
                pk_buf[slot, s, :,
                       RES2_C0P * h_dim:RES2_C1P * h_dim].astype(f32),
                pk_buf[slot, s, :,
                       RES2_C1P * h_dim:RES2_W * h_dim].astype(f32),
            )

        def write_dg(slot, s, dgates0, dgates1):
            dg0_buf[slot, s] = dgates0.astype(dg0_buf.dtype)
            dg1_buf[slot, s] = dgates1.astype(dg1_buf.dtype)

        step = _lstm2_step_fn(
            state_buf, keep_buf, dys_buf if has_dys else None,
            w_hh1_t_ref[:], w_ih1_t_ref[:], w_hh0_t_ref[:],
            h_dim, t_len, read_res, write_dg,
        )
        _reverse_chunk_walk(num_chunks, chunk, dma_in, dma_out, step,
                            unroll=chunk if full_unroll else 1)

    scratch = dict(
        pk_buf=pltpu.VMEM((2, chunk, batch, RES2_W * h_dim), pk_hbm.dtype),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        dg0_buf=pltpu.VMEM((2, chunk, batch, g4), dg0_hbm.dtype),
        dg1_buf=pltpu.VMEM((2, chunk, batch, g4), dg1_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2, 3 if has_dys else 2)),
        out_sem=pltpu.SemaphoreType.DMA((2, 2)),
        state_buf=pltpu.VMEM((4, batch, h_dim), jnp.float32),
    )
    if has_dys:
        scratch["dys_buf"] = pltpu.VMEM((2, chunk, batch, h_dim),
                                        jnp.float32)
    pl.run_scoped(body, **scratch)


def lstm2_bwd_chain_padded(
    packed: jnp.ndarray,    # (T_pad, B, 10H) from lstm2_train_fwd_residuals
    keep_pad: jnp.ndarray,  # (T_pad, B, H)
    dys,                    # (T_pad, B, H) or None
    dh_final: jnp.ndarray,  # (B, H)
    w_hh0: jnp.ndarray,
    w_hh1: jnp.ndarray,
    w_ih1: jnp.ndarray,
    t_len: int,
    chunk: int = None,
    interpret: bool = False,
    full_unroll: bool = None,
):
    """v2 fused reverse chain over pre-padded consumer-shaped residuals.

    Returns ``(dg0, dg1)`` each (T_pad, B, 4H) with pad rows ZERO, so the
    hoisted weight-gradient contractions run over T_pad unsliced.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = BWD2_CHUNK if chunk is None else chunk
    full_unroll = BWD2_UNROLL if full_unroll is None else full_unroll
    t_pad, batch, w10 = packed.shape
    h_dim = w10 // RES2_W
    g4 = 4 * h_dim
    assert t_pad % chunk == 0

    f32 = jnp.float32
    tile_b = _pick_tile_b(batch)
    has_dys = dys is not None
    kernel = functools.partial(_lstm2_bwd_res_kernel, t_len=t_len,
                               chunk=chunk, tile_b=tile_b,
                               full_unroll=full_unroll, has_dys=has_dys)
    operands = [packed, keep_pad]
    if has_dys:
        operands.append(dys.astype(f32))
    operands += [
        dh_final.astype(f32),
        w_hh1.astype(f32).T,
        w_ih1.astype(f32).T,
        w_hh0.astype(f32).T,
    ]
    # dgates stream in the residual dtype: with bf16 residuals the dg
    # write+read traffic (2 x (T, B, 4H)) halves too; the in-kernel dh/dc
    # carries and every matmul stay f32
    dg_dtype = packed.dtype
    dg0, dg1 = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, g4), dg_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, g4), dg_dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (3 if has_dys else 2)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        interpret=interpret,
    )(*operands)
    return dg0, dg1


# ---------------------------------------------------------------------------
# v3: gate-rematerializing reverse chain.  The v2 kernels are
# HBM-bandwidth-bound on the residual streams (docs/KERNELS.md "bf16
# residual streams"); the MXU, meanwhile, idles between the small serial
# matmuls.  v3 trades that idle MXU time for stream bytes: the forward
# stores only what cannot be recomputed (the c_prev series + the h_prev/x
# series the weight-gradient contractions need anyway — 5H instead of 13H
# of residual writes per step), and the backward REBUILDS the gate
# pre-activations in-kernel from the streamed series and the weights:
#   g0 = x @ w_ih0 + b0 + h0_prev @ w_hh0        (two extra dots)
#   g1 = [x1|h1_prev] @ [w_ih1;w_hh1] + b1       (one extra dot)
# The recomputation is the SAME f32 expression the forward evaluated, so
# in interpret mode gradients match the stored-gates path to matmul
# rounding (~1e-7 rel).  ON CHIP the recomputed dots tile differently and
# the reverse chain amplifies the seed difference to the recurrence's
# precision-chaos scale (max rel 0.08 at T=372, benchmarks/r3t_tpu.json —
# the same envelope as any cross-formulation change, docs/KERNELS.md
# "Numerics").  r3t measured the pair SLOWER end-to-end; ships off.
# ---------------------------------------------------------------------------


def _lstm2_bwd_remat_kernel(
    pk_hbm,     # (T_pad, B, 2H) ANY — packed [c0_prev|c1_prev]
    keep_hbm,   # (T_pad, B, H) ANY
    x_hbm,      # (T_pad, B, D) ANY — raw layer-0 input series
    x1_hbm,     # (T_pad, B, H) ANY — layer-1 input series (h0_new*keep)
    h0p_hbm,    # (T_pad, B, H) ANY — layer-0 pre-step h series
    h1p_hbm,    # (T_pad, B, H) ANY — layer-1 pre-step h series
    *maybe_dys_and_rest,
    t_len: int,
    chunk: int,
    tile_b: int,
    full_unroll: bool,
    has_dys: bool,
):
    """v2 reverse chain with in-kernel gate rematerialization."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_dys:
        (dys_hbm, dhf_ref, w_hh1_t_ref, w_ih1_t_ref, w_hh0_t_ref,
         w_ih0_ref, b0_ref, w_hh0_ref, w_xh1_ref, b1_ref,
         dg0_hbm, dg1_hbm) = maybe_dys_and_rest
    else:
        (dhf_ref, w_hh1_t_ref, w_ih1_t_ref, w_hh0_t_ref,
         w_ih0_ref, b0_ref, w_hh0_ref, w_xh1_ref, b1_ref,
         dg0_hbm, dg1_hbm) = maybe_dys_and_rest
        dys_hbm = None

    batch = tile_b
    h_dim = dhf_ref.shape[1]
    g4 = 4 * h_dim
    num_chunks = pk_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(pk_buf, keep_buf, x_buf, x1_buf, h0p_buf, h1p_buf,
             dg0_buf, dg1_buf, in_sem, out_sem, state_buf, dys_buf=None):
        state_buf[0] = dhf_ref[pl.ds(b0, tile_b)]
        state_buf[1] = jnp.zeros((batch, h_dim), jnp.float32)
        state_buf[2] = jnp.zeros((batch, h_dim), jnp.float32)
        state_buf[3] = jnp.zeros((batch, h_dim), jnp.float32)
        w_ih0 = w_ih0_ref[:]
        b0_row = b0_ref[:]
        w_hh0 = w_hh0_ref[:]
        w_xh1 = w_xh1_ref[:]
        b1_row = b1_ref[:]

        srcs = [pk_hbm, keep_hbm, x_hbm, x1_hbm, h0p_hbm, h1p_hbm]
        bufs = [pk_buf, keep_buf, x_buf, x1_buf, h0p_buf, h1p_buf]
        if has_dys:
            srcs.append(dys_hbm)
            bufs.append(dys_buf)
        dma_in = _chunked_in_copies(srcs, bufs, in_sem, b0, tile_b, chunk)

        def dma_out(slot, ci):
            row = pl.ds(ci * chunk, chunk)
            cols = pl.ds(b0, tile_b)
            return [
                pltpu.make_async_copy(
                    dg0_buf.at[slot], dg0_hbm.at[row, cols],
                    out_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    dg1_buf.at[slot], dg1_hbm.at[row, cols],
                    out_sem.at[slot, 1],
                ),
            ]

        def read_res(slot, s):
            f32 = jnp.float32
            cp0 = pk_buf[slot, s, :,
                         RES3_C0P * h_dim:RES3_C1P * h_dim].astype(f32)
            cp1 = pk_buf[slot, s, :,
                         RES3_C1P * h_dim:RES3_W * h_dim].astype(f32)
            # rematerialize the gate pre-activations (see block comment)
            g0 = (
                jnp.dot(x_buf[slot, s].astype(f32), w_ih0,
                        preferred_element_type=f32)
                + b0_row
                + jnp.dot(h0p_buf[slot, s].astype(f32), w_hh0,
                          preferred_element_type=f32)
            )
            xh1 = jnp.concatenate(
                [x1_buf[slot, s].astype(f32),
                 h1p_buf[slot, s].astype(f32)], axis=-1)
            g1 = jnp.dot(xh1, w_xh1, preferred_element_type=f32) + b1_row
            return g0, g1, cp0, cp1

        def write_dg(slot, s, dgates0, dgates1):
            dg0_buf[slot, s] = dgates0.astype(dg0_buf.dtype)
            dg1_buf[slot, s] = dgates1.astype(dg1_buf.dtype)

        step = _lstm2_step_fn(
            state_buf, keep_buf, dys_buf if has_dys else None,
            w_hh1_t_ref[:], w_ih1_t_ref[:], w_hh0_t_ref[:],
            h_dim, t_len, read_res, write_dg,
        )
        _reverse_chunk_walk(num_chunks, chunk, dma_in, dma_out, step,
                            unroll=chunk if full_unroll else 1)

    d_in = x_hbm.shape[-1]
    scratch = dict(
        pk_buf=pltpu.VMEM((2, chunk, batch, RES3_W * h_dim), pk_hbm.dtype),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        x_buf=pltpu.VMEM((2, chunk, batch, d_in), x_hbm.dtype),
        x1_buf=pltpu.VMEM((2, chunk, batch, h_dim), x1_hbm.dtype),
        h0p_buf=pltpu.VMEM((2, chunk, batch, h_dim), h0p_hbm.dtype),
        h1p_buf=pltpu.VMEM((2, chunk, batch, h_dim), h1p_hbm.dtype),
        dg0_buf=pltpu.VMEM((2, chunk, batch, g4), dg0_hbm.dtype),
        dg1_buf=pltpu.VMEM((2, chunk, batch, g4), dg1_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2, 7 if has_dys else 6)),
        out_sem=pltpu.SemaphoreType.DMA((2, 2)),
        state_buf=pltpu.VMEM((4, batch, h_dim), jnp.float32),
    )
    if has_dys:
        scratch["dys_buf"] = pltpu.VMEM((2, chunk, batch, h_dim),
                                        jnp.float32)
    pl.run_scoped(body, **scratch)


def lstm2_bwd_chain_remat(
    packed: jnp.ndarray,    # (T_pad, B, 2H) from the store_gates=False fwd
    keep_pad: jnp.ndarray,  # (T_pad, B, H)
    x_pad: jnp.ndarray,     # (T_pad, B, D) raw layer-0 input (pad rows any)
    x1: jnp.ndarray,        # (T_pad, B, H)
    h0p: jnp.ndarray,       # (T_pad, B, H)
    h1p: jnp.ndarray,       # (T_pad, B, H)
    dys,                    # (T_pad, B, H) or None
    dh_final: jnp.ndarray,  # (B, H)
    layer0: Dict[str, jnp.ndarray],
    layer1: Dict[str, jnp.ndarray],
    t_len: int,
    chunk: int = None,
    interpret: bool = False,
    full_unroll: bool = None,
):
    """v3 fused reverse chain: recomputes gate pre-activations in-kernel.

    Returns ``(dg0, dg1)`` each (T_pad, B, 4H) with pad rows ZERO, exactly
    like :func:`lstm2_bwd_chain_padded` — the hoisted weight-gradient
    contractions are unchanged.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = BWD2_CHUNK if chunk is None else chunk
    full_unroll = BWD2_UNROLL if full_unroll is None else full_unroll
    t_pad, batch, w2 = packed.shape
    h_dim = w2 // RES3_W
    g4 = 4 * h_dim
    assert t_pad % chunk == 0

    f32 = jnp.float32
    tile_b = _pick_tile_b(batch)
    has_dys = dys is not None
    kernel = functools.partial(_lstm2_bwd_remat_kernel, t_len=t_len,
                               chunk=chunk, tile_b=tile_b,
                               full_unroll=full_unroll, has_dys=has_dys)
    # Mosaic DMA slices must be lane-aligned: zero-pad the x stream (and
    # the matching w_ih0 rows — zeros contribute nothing to the dot) up
    # to a multiple of 128 lanes
    d_in = x_pad.shape[-1]
    d_128 = ((d_in + 127) // 128) * 128
    w_ih0 = layer0["w_ih"].astype(f32)
    if d_128 != d_in:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, 0), (0, d_128 - d_in)))
        w_ih0 = jnp.pad(w_ih0, ((0, d_128 - d_in), (0, 0)))
    operands = [packed, keep_pad, x_pad, x1, h0p, h1p]
    if has_dys:
        operands.append(dys.astype(f32))
    w_ih1 = layer1["w_ih"].astype(f32)
    w_hh1 = layer1["w_hh"].astype(f32)
    operands += [
        dh_final.astype(f32),
        w_hh1.T,
        w_ih1.T,
        layer0["w_hh"].astype(f32).T,
        w_ih0,
        layer0["b"].astype(f32).reshape(1, -1),
        layer0["w_hh"].astype(f32),
        jnp.concatenate([w_ih1, w_hh1], axis=0),  # (2H, 4H)
        layer1["b"].astype(f32).reshape(1, -1),
    ]
    dg_dtype = packed.dtype
    dg0, dg1 = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, g4), dg_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, g4), dg_dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (7 if has_dys else 6)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        interpret=interpret,
    )(*operands)
    return dg0, dg1


def bwd_remat_kernel_supported(batch: int, t_len: int, h_dim: int,
                               d_in: int, chunk: int = None,
                               allow_large: bool = False,
                               f32_large: bool = False) -> bool:
    """VMEM feasibility for the gate-remat reverse chain (v3)."""
    chunk = BWD2_CHUNK if chunk is None else chunk
    cap = _AUTO_MAX_BATCH_F32 if f32_large else _AUTO_MAX_BATCH
    if batch > cap and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    g4 = 4 * h_dim
    d_pad = ((d_in + 127) // 128) * 128  # lane padding in VMEM
    vmem = (
        # streams: pk 2H + keep/x1/h0p/h1p 4H + dys (worst case, counted
        # unconditionally like the v2 twin) + x + dg out 8H (f32 worst)
        2 * chunk * tile * (7 * h_dim + d_pad + 2 * g4) * 4
        # weights: 3 transposed (4H,H) + w_ih0 (D,4H) + w_hh0 + w_xh1 (2H,4H)
        + (3 * g4 * h_dim + d_pad * g4 + h_dim * g4 + 2 * h_dim * g4) * 4
        + 4 * tile * h_dim * 4  # carry state
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1


# ---------------------------------------------------------------------------
# GRU residual-native training pair (v2) — the round-3 LSTM redesign
# (docs/KERNELS.md "Round 3: residual-native training pair") applied to the
# GRU twin.  The legacy GRU kernel path pays every cost the LSTM v2
# removed: the forward emits POST-step series the VJP shift-copies into
# h_prev, x1 = h0n*keep is rebuilt outside, the fused backward RE-PACKS
# ten (T, B, H) series into two 5H buffers before launching (r2p measured
# it slower than the layered chains for exactly this movement), and both
# ends slice [:t_len].  Here the forward writes the residuals the
# backward actually reads — pre-step h series + gate activations packed
# by consumer — padding aligns both chunk walks, and the backward emits
# dih plus ONLY the dhn lane (dhh shares its first 2H lanes with dih), so
# the output stream is 4H per layer instead of 6H.
# ---------------------------------------------------------------------------

GRU_RES2_W = 8  # packed fwd residual width in H units: [r|z|n|hn] x 2 layers


def _gru2_fwd_res_kernel(
    ih0_hbm,    # (T_pad, B, 3H) ANY — hoisted layer-0 input projections
    keep_hbm,   # (T_pad, B, H) ANY — keep mask (zero at pad rows)
    w_hh0_ref,  # (H, 3H) VMEM
    b_hh0_ref,  # (1, 3H) VMEM
    w_ih1_ref,  # (H, 3H) VMEM
    b_ih1_ref,  # (1, 3H) VMEM
    w_hh1_ref,  # (H, 3H) VMEM
    b_hh1_ref,  # (1, 3H) VMEM
    pk_hbm,     # (T_pad, B, 8H) ANY out — packed [r0|z0|n0|hn0|r1|z1|n1|hn1]
    h0p_hbm,    # (T_pad, B, H) ANY out — layer-0 h_prev series
    h1p_hbm,    # (T_pad, B, H) ANY out — layer-1 h_prev series
    x1_hbm,     # (T_pad, B, H) ANY out — layer-1 input series h0_new*keep
    fin_ref,    # (2, B, H) VMEM out — finals [h0, h1]
    *,
    t_len: int,
    chunk: int,
    tile_b: int,
    full_unroll: bool,
    res_dtype=jnp.float32,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tile_b
    h_dim = w_hh0_ref.shape[0]
    g3 = 3 * h_dim
    num_chunks = ih0_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(ih_buf, keep_buf, pk_buf, h0p_buf, h1p_buf, x1_buf,
             in_sem, out_sem, state_buf):
        state_buf[:] = jnp.zeros((2, batch, h_dim), jnp.float32)
        w_hh0 = w_hh0_ref[:]
        b_hh0 = b_hh0_ref[:]
        w_ih1 = w_ih1_ref[:]
        b_ih1 = b_ih1_ref[:]
        w_hh1 = w_hh1_ref[:]
        b_hh1 = b_hh1_ref[:]

        dma_in = _chunked_in_copies((ih0_hbm, keep_hbm),
                                    (ih_buf, keep_buf),
                                    in_sem, b0, tile_b, chunk)

        def dma_out(slot, ci):
            row = pl.ds(ci * chunk, chunk)
            cols = pl.ds(b0, tile_b)
            return [
                pltpu.make_async_copy(
                    pk_buf.at[slot], pk_hbm.at[row, cols],
                    out_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    h0p_buf.at[slot], h0p_hbm.at[row, cols],
                    out_sem.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    h1p_buf.at[slot], h1p_hbm.at[row, cols],
                    out_sem.at[slot, 2],
                ),
                pltpu.make_async_copy(
                    x1_buf.at[slot], x1_hbm.at[row, cols],
                    out_sem.at[slot, 3],
                ),
            ]

        for cpy in dma_in(0, 0):
            cpy.start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < num_chunks)
            def _():
                for cpy in dma_in((ci + 1) % 2, ci + 1):
                    cpy.start()

            for cpy in dma_in(slot, ci):
                cpy.wait()

            @pl.when(ci >= 2)
            def _():
                for cpy in dma_out(slot, ci - 2):
                    cpy.wait()

            def step(s, _):
                t = ci * chunk + s
                h0 = state_buf[0]
                h1 = state_buf[1]
                h0n, r0, z0, n0, hn0 = _gru_step(
                    h0, ih_buf[slot, s], w_hh0, b_hh0, h_dim)
                x1 = h0n * keep_buf[slot, s]
                ih1 = jnp.dot(x1, w_ih1,
                              preferred_element_type=jnp.float32) + b_ih1
                h1n, r1, z1, n1, hn1 = _gru_step(h1, ih1, w_hh1, b_hh1,
                                                 h_dim)
                valid = t < t_len
                # residuals as consumed: gate activations + PRE-step h
                # (the legacy path's shift is free here); res_dtype=bf16
                # halves every stream, compute/carries stay f32
                for j, val in enumerate((r0, z0, n0, hn0,
                                         r1, z1, n1, hn1)):
                    pk_buf[slot, s, :, j * h_dim:(j + 1) * h_dim] = (
                        val.astype(res_dtype))
                h0p_buf[slot, s] = h0.astype(res_dtype)
                h1p_buf[slot, s] = h1.astype(res_dtype)
                x1_buf[slot, s] = x1.astype(res_dtype)
                state_buf[0] = jnp.where(valid, h0n, h0)
                state_buf[1] = jnp.where(valid, h1n, h1)
                return 0

            jax.lax.fori_loop(0, chunk, step, 0,
                              unroll=chunk if full_unroll else 1)
            for cpy in dma_out(slot, ci):
                cpy.start()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        @pl.when(num_chunks >= 2)
        def _():
            for cpy in dma_out(num_chunks % 2, num_chunks - 2):
                cpy.wait()

        for cpy in dma_out((num_chunks - 1) % 2, num_chunks - 1):
            cpy.wait()
        fin_ref[0, pl.ds(b0, tile_b)] = state_buf[0]
        fin_ref[1, pl.ds(b0, tile_b)] = state_buf[1]

    pl.run_scoped(
        body,
        ih_buf=pltpu.VMEM((2, chunk, batch, g3), jnp.float32),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        pk_buf=pltpu.VMEM((2, chunk, batch, GRU_RES2_W * h_dim), res_dtype),
        h0p_buf=pltpu.VMEM((2, chunk, batch, h_dim), res_dtype),
        h1p_buf=pltpu.VMEM((2, chunk, batch, h_dim), res_dtype),
        x1_buf=pltpu.VMEM((2, chunk, batch, h_dim), res_dtype),
        in_sem=pltpu.SemaphoreType.DMA((2, 2)),
        out_sem=pltpu.SemaphoreType.DMA((2, 4)),
        state_buf=pltpu.VMEM((2, batch, h_dim), jnp.float32),
    )


def gru2_train_fwd_residuals(
    x_tm: jnp.ndarray,     # (T, B, D) time-major input
    keep_tm: jnp.ndarray,  # (T, B, H) inter-layer keep mask
    layer0: Dict[str, jnp.ndarray],
    layer1: Dict[str, jnp.ndarray],
    chunk: int = None,
    interpret: bool = False,
    full_unroll: bool = None,
    res_dtype=jnp.float32,
):
    """GRU forward with consumer-shaped residuals (zero post-processing).

    Returns ``(packed, h0_prev, h1_prev, x1, keep_pad, finals, t_pad)``:
    ``packed`` (t_pad, B, 8H) = [r0|z0|n0|hn0|r1|z1|n1|hn1] for the fused
    reverse-chain kernel; ``h0_prev``/``h1_prev``/``x1`` (t_pad, B, H)
    feed both the reverse chain (GRU cell backward reads h_prev, unlike
    the LSTM's) and the hoisted weight-gradient contractions; ``finals``
    (2, B, H) = [h0, h1] at the last valid step.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = FWD_CHUNK if chunk is None else chunk
    full_unroll = FWD_TRAIN_UNROLL if full_unroll is None else full_unroll
    t_len, batch, _ = x_tm.shape
    h_dim = layer0["w_hh"].shape[0]

    ih0 = (
        x_tm.astype(jnp.float32) @ layer0["w_ih"].astype(jnp.float32)
        + layer0["b_ih"].astype(jnp.float32)
    )
    # pad to a multiple of BOTH chunk lengths so the backward re-pads
    # nothing
    align = max(chunk, BWD2_CHUNK)
    t_pad = ((t_len + align - 1) // align) * align
    pad = t_pad - t_len
    keep = keep_tm.astype(jnp.float32)
    if pad:
        ih0 = jnp.pad(ih0, ((0, pad), (0, 0), (0, 0)))
        keep = jnp.pad(keep, ((0, pad), (0, 0), (0, 0)))

    tile_b = _pick_tile_b(batch)
    kernel = functools.partial(_gru2_fwd_res_kernel, t_len=t_len,
                               chunk=chunk, tile_b=tile_b,
                               full_unroll=full_unroll, res_dtype=res_dtype)
    f32 = jnp.float32
    packed, h0p, h1p, x1, finals = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, GRU_RES2_W * h_dim),
                                 res_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), res_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), res_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), res_dtype),
            jax.ShapeDtypeStruct((2, batch, h_dim), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        ih0,
        keep,
        layer0["w_hh"].astype(f32),
        layer0["b_hh"].astype(f32).reshape(1, -1),
        layer1["w_ih"].astype(f32),
        layer1["b_ih"].astype(f32).reshape(1, -1),
        layer1["w_hh"].astype(f32),
        layer1["b_hh"].astype(f32).reshape(1, -1),
    )
    return packed, h0p, h1p, x1, keep, finals, t_pad


def gru_res2_kernel_supported(batch: int, t_len: int, h_dim: int,
                              chunk: int = None,
                              allow_large: bool = False) -> bool:
    """VMEM feasibility for the GRU residual-native fwd kernel."""
    chunk = FWD_CHUNK if chunk is None else chunk
    if batch > _AUTO_MAX_BATCH and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    vmem = (
        2 * chunk * tile * (4 * h_dim + (GRU_RES2_W + 3) * h_dim) * 4
        + 4 * h_dim * 3 * h_dim * 4
        + 2 * tile * h_dim * 4
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1


def _gru2_bwd_res_kernel(
    pk_hbm,     # (T_pad, B, 8H) ANY — packed [r0|z0|n0|hn0|r1|z1|n1|hn1]
    h0p_hbm,    # (T_pad, B, H) ANY
    h1p_hbm,    # (T_pad, B, H) ANY
    keep_hbm,   # (T_pad, B, H) ANY
    *maybe_dys_and_rest,
    t_len: int,
    chunk: int,
    tile_b: int,
    full_unroll: bool,
    has_dys: bool,
):
    """GRU v2 fused reverse chain over the packed residual buffer.

    Per step: two ``_gru_cell_bwd_k`` VPU blocks + THREE (B,3H)x(3H,H)
    matmuls (dh1 carry, the inter-layer dx1 hop, dh0 carry).  Emits dih
    per layer plus ONLY the dhn lane of dhh (its first 2H lanes equal
    dih's), each as its own HBM stream so every weight-gradient
    contraction reads a contiguous buffer.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_dys:
        (dys_hbm, dhf_ref, w_hh1_t_ref, w_ih1_t_ref, w_hh0_t_ref,
         dih0_hbm, dhn0_hbm, dih1_hbm, dhn1_hbm) = maybe_dys_and_rest
    else:
        (dhf_ref, w_hh1_t_ref, w_ih1_t_ref, w_hh0_t_ref,
         dih0_hbm, dhn0_hbm, dih1_hbm, dhn1_hbm) = maybe_dys_and_rest
        dys_hbm = None

    batch = tile_b
    h_dim = dhf_ref.shape[1]
    g3 = 3 * h_dim
    num_chunks = pk_hbm.shape[0] // chunk
    b0 = pl.program_id(0) * tile_b

    def body(pk_buf, h0p_buf, h1p_buf, keep_buf,
             dih0_buf, dhn0_buf, dih1_buf, dhn1_buf,
             in_sem, out_sem, state_buf, dys_buf=None):
        # state_buf: (2, tile_b, H) = dh1_carry, dh0_carry
        state_buf[0] = dhf_ref[pl.ds(b0, tile_b)]
        state_buf[1] = jnp.zeros((batch, h_dim), jnp.float32)
        w_hh1_t = w_hh1_t_ref[:]
        w_ih1_t = w_ih1_t_ref[:]
        w_hh0_t = w_hh0_t_ref[:]

        srcs = [pk_hbm, h0p_hbm, h1p_hbm, keep_hbm]
        bufs = [pk_buf, h0p_buf, h1p_buf, keep_buf]
        if has_dys:
            srcs.append(dys_hbm)
            bufs.append(dys_buf)
        dma_in = _chunked_in_copies(srcs, bufs, in_sem, b0, tile_b, chunk)

        def dma_out(slot, ci):
            row = pl.ds(ci * chunk, chunk)
            cols = pl.ds(b0, tile_b)
            return [
                pltpu.make_async_copy(buf.at[slot], hbm.at[row, cols],
                                      out_sem.at[slot, i])
                for i, (buf, hbm) in enumerate((
                    (dih0_buf, dih0_hbm), (dhn0_buf, dhn0_hbm),
                    (dih1_buf, dih1_hbm), (dhn1_buf, dhn1_hbm),
                ))
            ]

        def step(slot, s, t):
            f32 = jnp.float32
            pk = pk_buf[slot, s]
            r1 = pk[:, 4 * h_dim:5 * h_dim].astype(f32)
            z1 = pk[:, 5 * h_dim:6 * h_dim].astype(f32)
            n1 = pk[:, 6 * h_dim:7 * h_dim].astype(f32)
            hn1 = pk[:, 7 * h_dim:8 * h_dim].astype(f32)
            h1p = h1p_buf[slot, s].astype(f32)
            dh1_t = state_buf[0]
            if dys_buf is not None:
                dh1_t = dh1_t + dys_buf[slot, s]
            dih1, dhh1, dh1_dir = _gru_cell_bwd_k(dh1_t, h1p, r1, z1,
                                                  n1, hn1)
            dh1_prev = dh1_dir + jnp.dot(
                dhh1, w_hh1_t, preferred_element_type=jnp.float32
            )
            dx1 = jnp.dot(
                dih1, w_ih1_t, preferred_element_type=jnp.float32
            )
            r0 = pk[:, 0 * h_dim:1 * h_dim].astype(f32)
            z0 = pk[:, 1 * h_dim:2 * h_dim].astype(f32)
            n0 = pk[:, 2 * h_dim:3 * h_dim].astype(f32)
            hn0 = pk[:, 3 * h_dim:4 * h_dim].astype(f32)
            h0p = h0p_buf[slot, s].astype(f32)
            dh0_t = state_buf[1] + dx1 * keep_buf[slot, s]
            dih0, dhh0, dh0_dir = _gru_cell_bwd_k(dh0_t, h0p, r0, z0,
                                                  n0, hn0)
            dh0_prev = dh0_dir + jnp.dot(
                dhh0, w_hh0_t, preferred_element_type=jnp.float32
            )
            valid = t < t_len
            dih0_buf[slot, s] = jnp.where(valid, dih0,
                                          0.0).astype(dih0_buf.dtype)
            dhn0_buf[slot, s] = jnp.where(
                valid, dhh0[:, 2 * h_dim:g3], 0.0).astype(dhn0_buf.dtype)
            dih1_buf[slot, s] = jnp.where(valid, dih1,
                                          0.0).astype(dih1_buf.dtype)
            dhn1_buf[slot, s] = jnp.where(
                valid, dhh1[:, 2 * h_dim:g3], 0.0).astype(dhn1_buf.dtype)
            state_buf[0] = jnp.where(valid, dh1_prev, state_buf[0])
            state_buf[1] = jnp.where(valid, dh0_prev, state_buf[1])

        _reverse_chunk_walk(num_chunks, chunk, dma_in, dma_out, step,
                            unroll=chunk if full_unroll else 1)

    dg_dtype = pk_hbm.dtype
    scratch = dict(
        pk_buf=pltpu.VMEM((2, chunk, batch, GRU_RES2_W * h_dim), dg_dtype),
        h0p_buf=pltpu.VMEM((2, chunk, batch, h_dim), dg_dtype),
        h1p_buf=pltpu.VMEM((2, chunk, batch, h_dim), dg_dtype),
        keep_buf=pltpu.VMEM((2, chunk, batch, h_dim), jnp.float32),
        dih0_buf=pltpu.VMEM((2, chunk, batch, g3), dg_dtype),
        dhn0_buf=pltpu.VMEM((2, chunk, batch, h_dim), dg_dtype),
        dih1_buf=pltpu.VMEM((2, chunk, batch, g3), dg_dtype),
        dhn1_buf=pltpu.VMEM((2, chunk, batch, h_dim), dg_dtype),
        in_sem=pltpu.SemaphoreType.DMA((2, 5 if has_dys else 4)),
        out_sem=pltpu.SemaphoreType.DMA((2, 4)),
        state_buf=pltpu.VMEM((2, batch, h_dim), jnp.float32),
    )
    if has_dys:
        scratch["dys_buf"] = pltpu.VMEM((2, chunk, batch, h_dim),
                                        jnp.float32)
    pl.run_scoped(body, **scratch)


def gru2_bwd_chain_res_padded(
    packed: jnp.ndarray,    # (T_pad, B, 8H) from gru2_train_fwd_residuals
    h0p: jnp.ndarray,       # (T_pad, B, H)
    h1p: jnp.ndarray,       # (T_pad, B, H)
    keep_pad: jnp.ndarray,  # (T_pad, B, H)
    dys,                    # (T_pad, B, H) or None
    dh_final: jnp.ndarray,  # (B, H)
    w_hh0: jnp.ndarray,
    w_hh1: jnp.ndarray,
    w_ih1: jnp.ndarray,
    t_len: int,
    chunk: int = None,
    interpret: bool = False,
    full_unroll: bool = None,
):
    """GRU v2 fused reverse chain over pre-padded residuals.

    Returns ``(dih0, dhn0, dih1, dhn1)`` — (T_pad, B, 3H/H) with pad rows
    ZERO, so the hoisted weight-gradient contractions run over T_pad
    unsliced.  ``dhh_l = [dih_l[:, :2H] | dhn_l]`` (the shared-lane trick
    — only the dhn third differs between dih and dhh).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = BWD2_CHUNK if chunk is None else chunk
    full_unroll = BWD2_UNROLL if full_unroll is None else full_unroll
    t_pad, batch, w8 = packed.shape
    h_dim = w8 // GRU_RES2_W
    g3 = 3 * h_dim
    assert t_pad % chunk == 0

    f32 = jnp.float32
    tile_b = _pick_tile_b(batch)
    has_dys = dys is not None
    kernel = functools.partial(_gru2_bwd_res_kernel, t_len=t_len,
                               chunk=chunk, tile_b=tile_b,
                               full_unroll=full_unroll, has_dys=has_dys)
    operands = [packed, h0p, h1p, keep_pad]
    if has_dys:
        operands.append(dys.astype(f32))
    operands += [
        dh_final.astype(f32),
        w_hh1.astype(f32).T,
        w_ih1.astype(f32).T,
        w_hh0.astype(f32).T,
    ]
    dg_dtype = packed.dtype
    out = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, g3), dg_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), dg_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, g3), dg_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, h_dim), dg_dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (5 if has_dys else 4)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in range(4)),
        interpret=interpret,
    )(*operands)
    return out


def gru_bwd2_res_kernel_supported(batch: int, t_len: int, h_dim: int,
                                  chunk: int = None,
                                  allow_large: bool = False) -> bool:
    """VMEM feasibility for the GRU v2 fused reverse-chain kernel."""
    chunk = BWD2_CHUNK if chunk is None else chunk
    if batch > _AUTO_MAX_BATCH and not allow_large:
        return False
    tile = _pick_tile_b(batch)
    if batch % tile != 0 or tile < 8:
        return False
    vmem = (
        2 * chunk * tile * ((GRU_RES2_W + 4) * h_dim + 8 * h_dim) * 4
        + 3 * 3 * h_dim * h_dim * 4
        + 2 * tile * h_dim * 4
    )
    return vmem <= 12 * 1024 * 1024 and h_dim % 128 == 0 and t_len >= 1
