"""Generate the pinned golden arrays in tests/golden/.

Run once (`python tests/golden/make_goldens.py`) and commit the outputs;
tests compare the live frontend against these files so any numerical
regression in the resampler or log-mel path is caught bit-for-bit.

Every golden here is computed by an INDEPENDENT implementation — naive
loops, np.fft, and a from-scratch HTK filterbank — never by the package
under test, so agreement is evidence rather than tautology.

Reference contract being pinned (SURVEY.md §7 "hard parts"):
/root/reference/src/dataprocessing.py:196 loads audio with
librosa.load(sr=16000), whose resampler is soxr-hq (pyproject.toml:52-54
pins soxr<1.0).  librosa/soxr cannot be installed in this image, so the
resample golden is scipy's polyphase resampler with librosa's
'kaiser_best' filter design (beta=12.9846) — the quality tier librosa
itself uses when soxr is absent — computed in float64.  The measured
delta against the *analytic* truth on a bandlimited signal is asserted
separately in test_etl.py (no golden file needed: the truth is closed
form).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

HERE = Path(__file__).parent


def speech_like(n: int, sr: int, seed: int = 7) -> np.ndarray:
    """Synthetic speech-like signal: pitch harmonics under formant-ish
    envelopes, amplitude-modulated at syllable rate, plus pink-ish noise."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    f0 = 120.0 + 20.0 * np.sin(2 * np.pi * 2.3 * t)  # gliding pitch
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = np.zeros(n)
    for h, (fc, bw) in enumerate(
        [(500, 80), (1500, 120), (2500, 160), (3500, 200)], start=1
    ):
        env = np.exp(-0.5 * ((h * 120.0 - fc) / bw) ** 2) + 0.05
        sig += env * np.sin(h * phase) / h
    syllable = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t + 1.0)
    noise = rng.randn(n)
    # one-pole lowpass for pink-ish noise
    for i in range(1, n):
        noise[i] = 0.98 * noise[i - 1] + 0.2 * noise[i]
    sig = sig * syllable + 0.01 * noise
    return (sig / np.abs(sig).max()).astype(np.float64)


def golden_resample() -> None:
    from scipy.signal import firwin, resample_poly

    sr_in, sr_out = 48000, 16000
    up, down = 1, 3
    y = speech_like(sr_in, sr_in)  # 1 s
    # resampy 'kaiser_best' design: 64 sinc half-cycles per side,
    # beta=14.7697, rolloff 0.9475 — built here from firwin directly so
    # the golden shares no code with the package under test
    beta, half_cycles, rolloff = 14.769656459379492, 64, 0.9475
    max_rate = max(up, down)
    h = firwin(2 * half_cycles * max_rate + 1, rolloff / max_rate,
               window=("kaiser", beta))
    out = resample_poly(y, up, down, window=h)
    np.save(HERE / "resample_48k_to_16k_kaiser_best.npy",
            out.astype(np.float64))


def htk_mel_filterbank(sr, n_fft, n_mels, fmin, fmax):
    """Independent HTK triangular filterbank (naive loops)."""

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    n_bins = n_fft // 2 + 1
    freqs = np.arange(n_bins) * sr / n_fft
    fb = np.zeros((n_bins, n_mels))
    for m in range(n_mels):
        for b in range(n_bins):
            f = freqs[b]
            if pts[m] <= f <= pts[m + 1]:
                fb[b, m] = (f - pts[m]) / max(pts[m + 1] - pts[m], 1e-10)
            elif pts[m + 1] < f <= pts[m + 2]:
                fb[b, m] = (pts[m + 2] - f) / max(pts[m + 2] - pts[m + 1],
                                                  1e-10)
    return fb


def brute_force_logmel(wave, sr, n_fft, hop, win_length, n_mels, eps):
    """Naive per-frame STFT -> power -> mel -> log, all float64."""
    n = np.arange(win_length)
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))  # periodic Hann
    pad_left = (n_fft - win_length) // 2
    window = np.zeros(n_fft)
    window[pad_left:pad_left + win_length] = win
    fb = htk_mel_filterbank(sr, n_fft, n_mels, 0.0, sr / 2.0)
    num_frames = 1 + (len(wave) - n_fft) // hop
    out = np.zeros((num_frames, n_mels))
    for f in range(num_frames):
        frame = wave[f * hop:f * hop + n_fft] * window
        spec = np.fft.rfft(frame)
        power = spec.real**2 + spec.imag**2
        out[f] = power @ fb
    return np.log(out + eps)


def golden_logmel() -> None:
    sr = 16000
    y = speech_like(sr, sr, seed=11)  # 1 s @ 16 kHz
    np.save(HERE / "logmel_input_16k.npy", y.astype(np.float32))
    for hop in (128, 160):
        g = brute_force_logmel(
            y.astype(np.float64), sr, n_fft=512, hop=hop, win_length=400,
            n_mels=64, eps=1e-6,
        )
        np.save(HERE / f"logmel_hop{hop}.npy", g.astype(np.float64))


if __name__ == "__main__":
    golden_resample()
    golden_logmel()
    print("goldens written to", HERE)
