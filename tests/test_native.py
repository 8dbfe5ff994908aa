"""Native C++ ETL kernels vs their Python/scipy fallbacks."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module", autouse=True)
def built_library():
    lib = REPO / "native" / "libetl_kernels.so"
    if not lib.exists():
        subprocess.run(["bash", str(REPO / "native" / "build.sh")], check=True)
    from multimodal_emotion_detection_tpu.utils import native

    native.load_library.cache_clear()
    assert native.native_available(), "native library failed to load"
    yield


@pytest.mark.parametrize("up,down,n", [
    (1, 3, 48000),   # 48 kHz -> 16 kHz (the RAVDESS case)
    (160, 441, 4410),  # 44.1 kHz -> 16 kHz
    (2, 1, 1000),    # upsample
    (3, 2, 777),     # odd length
])
def test_native_resample_matches_scipy(up, down, n):
    from scipy.signal import resample_poly

    from multimodal_emotion_detection_tpu.utils.native import (
        resample_poly_native,
    )

    rng = np.random.RandomState(0)
    x = rng.randn(n)
    ours = resample_poly_native(x, up, down, beta=12.9846)
    ref = resample_poly(x, up, down, window=("kaiser", 12.9846))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_native_peak_normalize():
    from multimodal_emotion_detection_tpu.utils.native import (
        peak_normalize_native,
    )

    x = np.array([0.5, -2.0, 1.0], np.float32)
    out = peak_normalize_native(x.copy())
    np.testing.assert_allclose(out, [0.25, -1.0, 0.5], rtol=1e-6)
    zeros = peak_normalize_native(np.zeros(4, np.float32))
    np.testing.assert_array_equal(zeros, np.zeros(4, np.float32))


def test_wav_resample_uses_native_consistently(tmp_path):
    """utils.wav.resample output must not depend on which backend ran."""
    from multimodal_emotion_detection_tpu.utils import native
    from multimodal_emotion_detection_tpu.utils.wav import resample

    rng = np.random.RandomState(1)
    y = rng.randn(48000).astype(np.float32)
    with_native = resample(y, 48000, 16000)

    native.load_library.cache_clear()
    orig = native._LIB_PATH
    try:
        native._LIB_PATH = tmp_path / "missing.so"  # force fallback
        without_native = resample(y, 48000, 16000)
    finally:
        native._LIB_PATH = orig
        native.load_library.cache_clear()
    np.testing.assert_allclose(with_native, without_native, atol=1e-7)
