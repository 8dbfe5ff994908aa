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
