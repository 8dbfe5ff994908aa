"""ctypes bindings for the native ETL kernels (native/etl_kernels.cc).

Loads ``native/libetl_kernels.so`` when present (build with
``native/build.sh``); every entry has a pure-Python/scipy fallback so the
framework works without the native build.  ``resample_poly_native``
reproduces scipy.signal.resample_poly(window=('kaiser', beta)) including
its filter design and upfirdn pre/post padding, so native and fallback
paths are numerically identical (tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import functools
from math import gcd
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libetl_kernels.so"


@functools.lru_cache(maxsize=1)
def load_library() -> Optional[ctypes.CDLL]:
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.upfirdn_f64.argtypes = [f64p, i64, f64p, i64, i64, i64, f64p, i64]
    lib.upfirdn_f32.argtypes = [f32p, i64, f64p, i64, i64, i64, f32p, i64]
    lib.peak_normalize_f32.argtypes = [f32p, i64]
    lib.pcm16_to_f32_mono.argtypes = [
        ctypes.POINTER(ctypes.c_int16), i64, ctypes.c_int, f32p,
    ]
    return lib


def native_available() -> bool:
    return load_library() is not None


def _output_len(taps: int, n_in: int, up: int, down: int) -> int:
    """scipy.signal._upfirdn._output_len."""
    return (((n_in - 1) * up + taps) - 1) // down + 1


def _design_filter(
    up: int,
    down: int,
    beta: float,
    half_cycles: int = 10,
    rolloff: float = 1.0,
) -> np.ndarray:
    """Kaiser-windowed sinc low-pass for polyphase resampling, scaled by up.

    ``half_cycles=10, rolloff=1.0`` reproduces scipy.resample_poly's
    internal design exactly.  The audio frontend uses
    ``half_cycles=64, beta=14.7697, rolloff=0.9475`` — the parameters of
    resampy's 'kaiser_best', the filter librosa historically shipped as
    its quality tier — which shrinks the transition band enough that
    content at 0.8x the target Nyquist survives to ~1e-6 (the short scipy
    default leaks ~4e-2 there; measured in test_etl.py's analytic test).
    """
    from scipy.signal import firwin

    max_rate = max(up, down)
    half_len = half_cycles * max_rate
    f_c = rolloff / max_rate
    h = firwin(2 * half_len + 1, f_c, window=("kaiser", beta))
    return h * up


def resample_poly_native(
    x: np.ndarray,
    up: int,
    down: int,
    beta: float = 12.9846,
    half_cycles: int = 10,
    rolloff: float = 1.0,
) -> Optional[np.ndarray]:
    """scipy.signal.resample_poly equivalent via the native upfirdn core.

    Returns None when the native library is unavailable (caller falls back
    to scipy).  float64 output, same as scipy for float64 input.
    """
    lib = load_library()
    if lib is None:
        return None
    g = gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    if up == down == 1:
        return np.asarray(x, dtype=np.float64)

    x = np.ascontiguousarray(x, dtype=np.float64)
    n_in = len(x)
    n_out = n_in * up
    n_out = n_out // down + bool(n_out % down)

    h = _design_filter(up, down, beta, half_cycles, rolloff)
    half_len = (len(h) - 1) // 2
    # scipy's padding so the group delay lands on integer output samples
    n_pre_pad = down - half_len % down
    n_post_pad = 0
    n_pre_remove = (half_len + n_pre_pad) // down
    while _output_len(len(h) + n_pre_pad + n_post_pad, n_in, up, down) < (
        n_out + n_pre_remove
    ):
        n_post_pad += 1
    h_padded = np.concatenate(
        [np.zeros(n_pre_pad), h, np.zeros(n_post_pad)]
    ).astype(np.float64)

    total_out = _output_len(len(h_padded), n_in, up, down)
    y = np.empty(total_out, dtype=np.float64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.upfirdn_f64(
        x.ctypes.data_as(f64p), n_in,
        h_padded.ctypes.data_as(f64p), len(h_padded),
        up, down,
        y.ctypes.data_as(f64p), total_out,
    )
    return y[n_pre_remove:n_pre_remove + n_out]


def peak_normalize_native(x: np.ndarray) -> np.ndarray:
    """In-place peak normalization (returns x); falls back to numpy."""
    lib = load_library()
    x = np.ascontiguousarray(x, dtype=np.float32)
    if lib is None:
        peak = np.abs(x).max()
        return x / peak if peak > 0 else x
    lib.peak_normalize_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x)
    )
    return x
