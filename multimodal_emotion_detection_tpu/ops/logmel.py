"""Fused log-mel spectrogram frontend (Pallas TPU kernel + XLA reference).

This is the TPU answer to the reference's 48,000-step raw-waveform LSTM
(SURVEY.md §3.1: the hot loop at /root/reference/src/encoders.py:137-155 is
a sequential recurrence over 48k samples).  Collapsing the waveform to
~375 log-mel frames *before* any recurrence turns a latency-dominated scan
into a handful of MXU matmuls:

    frames = overlapped 512-sample windows          (layout trick, no gather)
    re, im = frames @ (win * cos), frames @ (win * sin)   # MXU
    mel    = (re^2 + im^2) @ mel_filterbank               # MXU
    out    = log(mel + eps)                               # VPU, fused

TPU-native design choices:
* ``hop_length`` defaults to **128 = TPU lane width** (8 ms @ 16 kHz), so a
  frame tile is built from 4 *contiguous, statically-offset* slices of the
  (rows, 128)-reshaped waveform — zero dynamic gathers inside the kernel.
* The Hann window is folded into the DFT basis (one fewer VPU pass).
* Everything for a batch tile lives in VMEM; the (B, F, 512) frame matrix
  never touches HBM (the XLA fallback materializes it; the Pallas kernel
  is what removes that traffic).

The DFT basis/mel weights are closed-over constants; XLA hoists them.
Gradients are never required (the frontend consumes input data, not
parameters), so no custom VJP is defined.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LogMelParams:
    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 128  # = TPU lane width; 8 ms @ 16 kHz
    win_length: int = 400  # 25 ms
    n_mels: int = 64
    fmin: float = 0.0
    fmax: Optional[float] = None
    log_epsilon: float = 1e-6

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        if num_samples < self.n_fft:
            return 0
        return 1 + (num_samples - self.n_fft) // self.hop_length


# ---------------------------------------------------------------------------
# Filterbank / basis construction (host-side numpy, cached)
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_np(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: Optional[float]
) -> np.ndarray:
    """HTK-style triangular mel filterbank, (n_bins, n_mels)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    mel_points = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_points = _mel_to_hz(mel_points)
    bin_freqs = np.arange(n_bins) * sample_rate / n_fft
    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, center, hi = hz_points[m], hz_points[m + 1], hz_points[m + 2]
        up = (bin_freqs - lo) / max(center - lo, 1e-10)
        down = (hi - bin_freqs) / max(hi - center, 1e-10)
        fb[:, m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb.astype(np.float32)


def mel_filterbank(params: LogMelParams) -> np.ndarray:
    return _mel_filterbank_np(
        params.sample_rate, params.n_fft, params.n_mels, params.fmin, params.fmax
    )


@functools.lru_cache(maxsize=8)
def _dft_basis_np(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Window-folded real-DFT basis: (n_fft, n_bins) cos and -sin matrices."""
    n_bins = n_fft // 2 + 1
    # Periodic Hann of win_length, centre-padded to n_fft (librosa convention)
    n = np.arange(win_length)
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    pad_left = (n_fft - win_length) // 2
    window = np.zeros(n_fft)
    window[pad_left:pad_left + win_length] = win
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * t * k / n_fft
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


# ---------------------------------------------------------------------------
# XLA reference implementation (runs everywhere)
# ---------------------------------------------------------------------------


def logmel_frames(wave: jnp.ndarray, params: LogMelParams) -> jnp.ndarray:
    """Pure-XLA log-mel: wave (B, T) or (B, T, 1) -> (B, F, n_mels)."""
    if wave.ndim == 3:
        wave = wave[..., 0]
    b, t = wave.shape
    f = params.num_frames(t)
    if f < 1:
        raise ValueError(
            f"log-mel frontend: waveform of {t} samples is shorter than one "
            f"STFT window (n_fft={params.n_fft}) — 0 frames. Check that the "
            "audio input is a raw waveform (e.g. dataset.sequence_length too "
            "small for model.frontend.audio='logmel')."
        )
    cos_b, sin_b = _dft_basis_np(params.n_fft, params.win_length)
    melw = mel_filterbank(params)

    idx = (
        np.arange(f)[:, None] * params.hop_length + np.arange(params.n_fft)[None, :]
    )
    frames = wave[:, idx]  # (B, F, n_fft) via gather
    frames = frames.astype(jnp.float32)
    # HIGHEST precision: DEFAULT would round matmul inputs to bf16 on the
    # MXU (and oneDNN does the analogue on CPU), a ~0.4% spectral error;
    # the frontend is cheap relative to the encoders, so buy exactness.
    hp = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=hp)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=hp)
    power = re * re + im * im
    mel = jnp.matmul(power, jnp.asarray(melw), precision=hp)
    return jnp.log(mel + params.log_epsilon)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

_LANE = 128


def _logmel_kernel(x_ref, cos_ref, sin_ref, mel_ref, out_ref, *, params, f_pad):
    """One batch tile: x_ref (TB, rows, 128) -> out_ref (TB, f_pad, n_mels).

    Frames are assembled from ``n_fft // hop`` contiguous sublane slices of
    the lane-major waveform — the hop==128 layout trick.
    """
    tb = x_ref.shape[0]
    n_fft = params.n_fft
    steps = n_fft // params.hop_length  # slices per frame (4 for 512/128)
    tile_f = _LANE  # frames computed per inner tile
    num_tiles = f_pad // tile_f

    cos_b = cos_ref[:]
    sin_b = sin_ref[:]
    melw = mel_ref[:]

    for ft in range(num_tiles):
        base = ft * tile_f
        # (TB, tile_f, n_fft): concat of `steps` shifted contiguous views
        parts = [
            x_ref[:, base + k: base + k + tile_f, :] for k in range(steps)
        ]
        frames = jnp.concatenate(parts, axis=-1)  # (TB, tile_f, n_fft)
        flat = frames.reshape(tb * tile_f, n_fft)
        hp = jax.lax.Precision.HIGHEST  # keep full f32 through the MXU
        re = jnp.dot(flat, cos_b, preferred_element_type=jnp.float32,
                     precision=hp)
        im = jnp.dot(flat, sin_b, preferred_element_type=jnp.float32,
                     precision=hp)
        power = re * re + im * im
        mel = jnp.dot(power, melw, preferred_element_type=jnp.float32,
                      precision=hp)
        out = jnp.log(mel + params.log_epsilon)
        out_ref[:, base: base + tile_f, :] = out.reshape(
            tb, tile_f, params.n_mels
        )


def _pick_tile_b(b: int, rows: int, f_pad: int, params: LogMelParams) -> int:
    """Largest batch tile whose working set fits the ~16 MB VMEM budget.

    Counts the double-buffered in/out blocks, the (replicated) DFT/mel
    constants, and the per-tile frame/spectrum intermediates (measured
    16.4 MB at tile 8 for the default config — just over the limit).
    """
    budget = 12 * 1024 * 1024  # headroom under the 16 MB scoped limit
    n_bins_padded = ((params.n_bins + _LANE - 1) // _LANE) * _LANE
    basis = (2 * params.n_fft * params.n_bins
             + params.n_bins * params.n_mels) * 4
    for tb in (8, 4, 2, 1):
        if b % tb:
            continue
        blocks = 2 * tb * (rows * _LANE + f_pad * params.n_mels) * 4
        frames = tb * _LANE * params.n_fft * 4
        spectra = 3 * tb * _LANE * n_bins_padded * 4  # re, im, power
        if basis + blocks + frames + spectra <= budget:
            return tb
    return 1


def _pallas_supported(params: LogMelParams, t: int) -> bool:
    return (
        params.hop_length == _LANE
        and params.n_fft % params.hop_length == 0
        and t % _LANE == 0
    )


def logmel_pallas(
    wave: jnp.ndarray, params: LogMelParams, interpret: bool = False
) -> jnp.ndarray:
    """Fused Pallas log-mel: wave (B, T) or (B, T, 1) -> (B, F, n_mels)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if wave.ndim == 3:
        wave = wave[..., 0]
    b, t = wave.shape
    if not _pallas_supported(params, t):
        raise ValueError(
            "Pallas logmel needs hop_length == 128 and T % 128 == 0; "
            f"got hop={params.hop_length}, T={t}"
        )
    f = params.num_frames(t)
    tile_f = _LANE
    f_pad = ((f + tile_f - 1) // tile_f) * tile_f
    steps = params.n_fft // params.hop_length
    # rows of 128 lanes; last frame tile reads up to f_pad-1 + steps rows
    rows_needed = f_pad + steps
    rows_have = t // _LANE
    if rows_needed > rows_have:
        pad = (rows_needed - rows_have) * _LANE
        wave = jnp.pad(wave, ((0, 0), (0, pad)))
    rows = rows_needed
    x = wave.reshape(b, rows, _LANE).astype(jnp.float32)

    tile_b = _pick_tile_b(b, rows, f_pad, params)
    cos_b, sin_b = _dft_basis_np(params.n_fft, params.win_length)
    melw = mel_filterbank(params)

    kernel = functools.partial(_logmel_kernel, params=params, f_pad=f_pad)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, f_pad, params.n_mels), jnp.float32),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec(
                (tile_b, rows, _LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (params.n_fft, params.n_bins), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (params.n_fft, params.n_bins), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (params.n_bins, params.n_mels), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, f_pad, params.n_mels), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_pad * params.n_fft * params.n_bins * 2
            + 2 * b * f_pad * params.n_bins * params.n_mels,
            bytes_accessed=b * rows * _LANE * 4 + b * f_pad * params.n_mels * 4,
            transcendentals=b * f_pad * params.n_mels,
        ),
        interpret=interpret,
    )(x, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(melw))
    return out[:, :f, :]


def log_mel_spectrogram(
    wave: jnp.ndarray,
    params: LogMelParams,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dispatcher: Pallas kernel on TPU (when the layout permits), XLA
    reference otherwise.  Both paths are numerically identical (same basis
    and filterbank constants; tested to ~1e-5)."""
    t = wave.shape[1]
    if params.num_frames(t) < 1:
        raise ValueError(
            f"log-mel frontend: waveform of {t} samples is shorter than one "
            f"STFT window (n_fft={params.n_fft}) — 0 frames. Check that the "
            "audio input is a raw waveform (e.g. dataset.sequence_length too "
            "small for model.frontend.audio='logmel')."
        )
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and (on_tpu or interpret) and _pallas_supported(params, t):
        return logmel_pallas(wave, params, interpret=interpret)
    return logmel_frames(wave, params)


# ---------------------------------------------------------------------------
# MFCC (DCT-II over log-mel)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _dct_matrix_np(n_mels: int, n_mfcc: int) -> np.ndarray:
    """Orthonormal DCT-II basis, (n_mels, n_mfcc) — librosa/scipy norm='ortho'."""
    n = np.arange(n_mels)[:, None]
    k = np.arange(n_mfcc)[None, :]
    basis = np.cos(np.pi * (2 * n + 1) * k / (2 * n_mels))
    basis *= np.sqrt(2.0 / n_mels)
    basis[:, 0] *= 1.0 / np.sqrt(2.0)
    return basis.astype(np.float32)


def mfcc(
    wave: jnp.ndarray,
    params: LogMelParams,
    n_mfcc: int = 40,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """MFCC frontend: log-mel (fused kernel) -> orthonormal DCT-II matmul.

    (B, T[,1]) -> (B, F, n_mfcc).  The DCT is one extra (n_mels, n_mfcc)
    matmul XLA fuses onto the MXU after the kernel.
    """
    logm = log_mel_spectrogram(wave, params, use_pallas=use_pallas,
                               interpret=interpret)
    dct = jnp.asarray(_dct_matrix_np(params.n_mels, n_mfcc))
    return jnp.matmul(logm, dct, precision=jax.lax.Precision.HIGHEST)
