"""ETL: filename parsing, AV join, WAV decode/resample, splits, end-to-end."""

import wave
from pathlib import Path

import numpy as np
import pytest

from multimodal_emotion_detection_tpu.data.ravdess import (
    build_join_key_map,
    build_ravdess_multimodal_raw,
    load_raw_audio,
    map_emotion_label,
    parse_ravdess_filename,
    save_splits_to_disk,
    stratified_two_stage_split,
)
from multimodal_emotion_detection_tpu.utils.wav import (
    load_audio,
    read_wav,
    resample,
)


def write_wav(path, data, sr, sampwidth=2, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        if sampwidth == 2:
            w.writeframes(
                (np.clip(data, -1, 1) * 32767).astype("<i2").tobytes()
            )
        else:
            raise ValueError


def test_parse_ravdess_filename():
    meta = parse_ravdess_filename("02-01-06-01-02-01-12.wav")
    assert meta == {
        "modality": 2, "channel": 1, "emotion": 6, "intensity": 1,
        "statement": 2, "repetition": 1, "actor": 12,
    }
    assert map_emotion_label(meta) == 5
    with pytest.raises(ValueError, match="Unexpected RAVDESS"):
        parse_ravdess_filename("01-02-03.wav")
    with pytest.raises(ValueError, match="Invalid emotion"):
        map_emotion_label({"emotion": 9})


def test_join_key_map_prefers_lower_modality(tmp_path):
    paths = []
    for stem in ("03-01-06-01-02-01-12", "01-01-06-01-02-01-12",
                 "02-01-05-01-01-01-01"):
        p = tmp_path / f"{stem}.wav"
        p.touch()
        paths.append(p)
    jm = build_join_key_map(paths)
    # modality 01 beats 03 for the shared join key
    assert jm["01-06-01-02-01-12"].stem.startswith("01-")
    assert len(jm) == 2


def test_wav_reader_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    y = 0.5 * np.sin(2 * np.pi * 440 * t)
    write_wav(tmp_path / "a.wav", y, sr)
    data, got_sr = read_wav(tmp_path / "a.wav")
    assert got_sr == sr
    np.testing.assert_allclose(data, y, atol=1e-4)


def test_wav_stereo_mixdown(tmp_path):
    sr = 8000
    left = 0.5 * np.ones(100)
    right = -0.5 * np.ones(100)
    inter = np.empty(200)
    inter[0::2] = left
    inter[1::2] = right
    with wave.open(str(tmp_path / "s.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((inter * 32767).astype("<i2").tobytes())
    data, _ = read_wav(tmp_path / "s.wav")
    np.testing.assert_allclose(data, 0.0, atol=1e-4)  # mono mixdown


def test_resample_preserves_tone(tmp_path):
    sr = 48000
    t = np.arange(int(sr * 0.5)) / sr
    y = np.sin(2 * np.pi * 440 * t)
    write_wav(tmp_path / "hi.wav", y, sr)
    data, got = load_audio(tmp_path / "hi.wav", sr=16000)
    assert got == 16000
    assert abs(len(data) - 8000) <= 2
    # dominant frequency survives resampling
    spec = np.abs(np.fft.rfft(data * np.hanning(len(data))))
    peak_hz = np.argmax(spec) * 16000 / len(data)
    assert abs(peak_hz - 440) < 5


def test_load_raw_audio_contract(tmp_path):
    sr = 48000
    y = 0.25 * np.sin(np.linspace(0, 700, sr))  # 1 s @ 48k -> pads to 3 s
    write_wav(tmp_path / "03-01-04-01-01-01-05.wav", y, sr)
    out = load_raw_audio(tmp_path / "03-01-04-01-01-01-05.wav")
    assert out.shape == (48000, 1)
    assert out.dtype == np.float32
    assert np.abs(out).max() == pytest.approx(1.0, abs=1e-5)  # peak norm
    assert np.abs(out[16000 + 10:]).max() == 0.0  # zero pad after 1 s


def test_resample_matches_pinned_golden():
    """48k->16k polyphase == the pinned kaiser_best golden (bitwise-tight).

    Golden recorded by tests/golden/make_goldens.py: scipy resample_poly
    with librosa's 'kaiser_best' filter (beta=12.9846) in float64 — the
    quality tier of the reference's librosa.load(sr=16000) contract
    (/root/reference/src/dataprocessing.py:196).  Catches any regression
    in the native C++ upfirdn core or the scipy fallback.
    """
    import sys

    golden_dir = Path(__file__).parent / "golden"
    sys.path.insert(0, str(golden_dir))
    try:
        from make_goldens import speech_like
    finally:
        sys.path.pop(0)
    y = speech_like(48000, 48000)
    golden = np.load(golden_dir / "resample_48k_to_16k_kaiser_best.npy")
    out = resample(y.astype(np.float32), 48000, 16000)
    assert out.shape == golden.shape
    # float32 I/O against a float64 golden: agreement to fp32 resolution
    np.testing.assert_allclose(out, golden.astype(np.float32), atol=2e-6)


def test_resample_error_vs_analytic_truth():
    """Measured resampler error against the closed-form truth.

    A signal bandlimited below the target Nyquist (sum of tones < 6.4 kHz)
    has an exact 16 kHz resampling: the same tones evaluated on the 16 kHz
    grid.  This replaces the unverifiable '~1e-3' estimate with a measured
    bound: with the kaiser_best-grade filter (64 half-cycles, rolloff
    0.9475) interior samples agree with the closed-form truth to ~1e-7
    even at 0.8x Nyquist (the old 10-half-cycle scipy default leaked
    1.8e-3 there).  Edge transients are excluded (the polyphase filter has
    no signal context at the boundaries).
    """
    sr_in, sr_out, dur = 48000, 16000, 1.0
    freqs = [230.0, 1150.0, 3170.0, 6390.0]
    amps = [0.5, 0.3, 0.15, 0.05]
    t_in = np.arange(int(sr_in * dur)) / sr_in
    t_out = np.arange(int(sr_out * dur)) / sr_out
    y = sum(a * np.sin(2 * np.pi * f * t_in) for a, f in zip(amps, freqs))
    truth = sum(a * np.sin(2 * np.pi * f * t_out) for a, f in zip(amps, freqs))
    out = resample(y.astype(np.float32), sr_in, sr_out)
    interior = slice(400, -400)
    err = np.abs(out[interior] - truth[interior]).max()
    assert err < 1e-5, f"resampler error vs analytic truth: {err:.2e}"


@pytest.mark.parametrize("hop", [128, 160])
def test_logmel_matches_brute_force_golden(hop):
    """Log-mel (XLA path) == pinned naive-STFT golden for hop 128 AND 160.

    The golden (tests/golden/make_goldens.py) is a float64 per-frame loop:
    periodic Hann(400) centre-padded to 512, np.fft.rfft, power, an
    independently constructed HTK filterbank, log(x + 1e-6) — sharing no
    code with ops/logmel.py.  hop=160 (librosa's 10 ms default) exercises
    the non-lane-aligned XLA route; hop=128 the flagship layout.
    """
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.logmel import (
        LogMelParams,
        log_mel_spectrogram,
    )

    golden_dir = Path(__file__).parent / "golden"
    wave = np.load(golden_dir / "logmel_input_16k.npy")
    golden = np.load(golden_dir / f"logmel_hop{hop}.npy")
    params = LogMelParams(hop_length=hop)
    out = log_mel_spectrogram(
        jnp.asarray(wave[None, :]), params, use_pallas=False
    )[0]
    assert out.shape == golden.shape
    np.testing.assert_allclose(
        np.asarray(out), golden.astype(np.float32), atol=2e-4, rtol=2e-5
    )


def test_stratified_split_membership():
    labels = np.repeat(np.arange(8), 20)  # 160 samples, 20 per class
    tr, va, te = stratified_two_stage_split(labels, labels, 0.1, 0.1, 42)
    assert len(tr) + len(va) + len(te) == 160
    assert len(set(tr) | set(va) | set(te)) == 160  # disjoint cover
    assert len(va) == 16 and len(te) == 16
    # stratification: each class appears in train ~16 times
    counts = np.bincount(labels[tr], minlength=8)
    assert counts.min() >= 14 and counts.max() <= 18
    # determinism
    tr2, _, _ = stratified_two_stage_split(labels, labels, 0.1, 0.1, 42)
    np.testing.assert_array_equal(np.sort(tr), np.sort(tr2))


def test_split_membership_matches_reference_pattern():
    """Index sets == the reference's exact two-stage train_test_split.

    Executes the reference's pattern (/root/reference/src/dataprocessing.py
    :392-421): stage 1 splits (features, labels, strat_keys) with
    stratify=strat_keys, stage 2 splits the temp pool with stratify=y_temp,
    both at random_state=42.  An index column rides along to recover
    membership; if this ever diverges from ``stratified_two_stage_split``,
    every accuracy comparison against the reference is apples-to-oranges
    (SURVEY.md §7).
    """
    pytest.importorskip("sklearn")
    from sklearn.model_selection import train_test_split

    rng = np.random.RandomState(0)
    n = 240
    labels = rng.randint(0, 8, size=n)
    strat_keys = labels.copy()  # stratify_by='emotion' (ref :365-366)
    feats = rng.randn(n, 4).astype(np.float32)
    idx = np.arange(n)
    val_size, test_size, seed = 0.15, 0.15, 42

    # --- reference pattern, verbatim call structure ---
    temp_frac = val_size + test_size
    (_, _, y_tr, y_temp, _, _, ref_tr, ref_temp) = train_test_split(
        feats, labels, strat_keys, idx,
        test_size=temp_frac, random_state=seed, stratify=strat_keys,
    )
    val_rel = val_size / temp_frac
    (_, _, ref_val, ref_test) = train_test_split(
        y_temp, ref_temp,
        test_size=1 - val_rel, random_state=seed, stratify=y_temp,
    )

    ours_tr, ours_val, ours_test = stratified_two_stage_split(
        labels, strat_keys, val_size, test_size, seed
    )
    assert set(ours_tr) == set(ref_tr)
    assert set(ours_val) == set(ref_val)
    assert set(ours_test) == set(ref_test)


def test_etl_end_to_end_audio_only(tmp_path):
    sr = 22050
    rng = np.random.RandomState(0)
    audio_dir = tmp_path / "wavs"
    audio_dir.mkdir()
    for emotion in range(1, 9):
        for rep in (1, 2):
            for actor in (1, 2):
                stem = f"03-01-{emotion:02d}-01-01-{rep:02d}-{actor:02d}"
                write_wav(audio_dir / f"{stem}.wav",
                          0.3 * rng.randn(sr), sr)
    train, val, test = build_ravdess_multimodal_raw(
        str(audio_dir), use_video=False, val_size=0.25, test_size=0.25,
    )
    n = len(train["labels"]) + len(val["labels"]) + len(test["labels"])
    assert n == 32
    assert train["audio"].shape[1:] == (48000, 1)
    out = tmp_path / "ds"
    save_splits_to_disk(train, val, test, out, modalities=["audio"])
    for split in ("train", "val", "test"):
        assert (out / split / "audio.npy").exists()
        assert (out / split / "labels.npy").exists()
    a = np.load(out / "train" / "audio.npy")
    assert a.dtype == np.float32 and a.shape[1:] == (48000, 1)


def test_manifest_etl_end_to_end(tmp_path):
    """Second-dataset recipe: IEMOCAP-style manifest -> npy layout -> train.

    Builds a session-structured corpus (wav audio + precomputed per-
    utterance .npy mocap tracks + CSV manifest), runs the generic manifest
    ETL, and checks the output trains through the standard loader path —
    the dataset-agnostic claim of the array data model, proven on a layout
    the RAVDESS filename parser could never handle.
    """
    from multimodal_emotion_detection_tpu.data.manifest import (
        build_manifest_multimodal,
    )

    rng = np.random.RandomState(0)
    sr = 16000
    rows = ["label,strat_key,audio,mocap"]
    (tmp_path / "clips").mkdir()
    (tmp_path / "feats").mkdir()
    n = 0
    for session in ("Ses01", "Ses02"):
        for emotion in range(4):
            for utt in range(4):
                stem = f"{session}_e{emotion}_u{utt}"
                write_wav(tmp_path / "clips" / f"{stem}.wav",
                          0.4 * rng.randn(sr), sr)
                np.save(tmp_path / "feats" / f"{stem}.npy",
                        rng.randn(rng.randint(40, 80), 6).astype(np.float32))
                rows.append(
                    f"{emotion},{session},clips/{stem}.wav,feats/{stem}.npy"
                )
                n += 1
    (tmp_path / "manifest.csv").write_text("\n".join(rows) + "\n")

    out = tmp_path / "ds"
    splits = build_manifest_multimodal(
        tmp_path / "manifest.csv", out, audio_seconds=1.0, feature_len=64,
        val_size=0.25, test_size=0.25,
    )
    total = sum(len(s["labels"]) for s in splits.values())
    assert total == n
    assert splits["train"]["audio"].shape[1:] == (16000, 1)
    assert splits["train"]["mocap"].shape[1:] == (64, 6)  # padded/truncated

    # the written layout loads through the standard dataset/loader path
    from multimodal_emotion_detection_tpu.data.dataset import ArrayDataset
    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader

    arrays = ArrayDataset(out, ["audio", "mocap"], "train").arrays
    loader = MultimodalLoader(arrays, batch_size=4, shuffle=True)
    feats, labels, mask = next(iter(loader))
    assert feats["audio"].shape == (4, 16000, 1)
    assert feats["mocap"].shape == (4, 64, 6)
    assert mask.shape == (4, 2)


def test_manifest_etl_error_paths(tmp_path):
    from multimodal_emotion_detection_tpu.data.manifest import (
        build_manifest_multimodal,
        read_manifest,
    )

    (tmp_path / "bad.csv").write_text("foo,bar\n1,2\n")
    with pytest.raises(ValueError, match="label"):
        read_manifest(tmp_path / "bad.csv")

    (tmp_path / "missing.csv").write_text("label,audio\n0,nope.wav\n")
    with pytest.raises(FileNotFoundError, match="audio"):
        build_manifest_multimodal(tmp_path / "missing.csv", tmp_path / "o")


def test_wav_reader_crisp_error_on_non_pcm(tmp_path):
    """Non-PCM WAV containers raise an actionable error, not a stdlib one."""
    # minimal RIFF/WAVE header claiming WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    import struct

    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 36 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    p = tmp_path / "ext.wav"
    p.write_bytes(blob)
    with pytest.raises(ValueError, match="plain-PCM"):
        read_wav(p)


def test_build_stem_map(tmp_path):
    from multimodal_emotion_detection_tpu.data.ravdess import build_stem_map

    p1 = tmp_path / "03-01-01-01-01-01-01.wav"
    p2 = tmp_path / "03-01-02-01-01-01-01.wav"
    p1.touch(); p2.touch()
    m = build_stem_map([p1, p2])
    assert m["03-01-01-01-01-01-01"] == p1
    d = tmp_path / "sub"
    d.mkdir()
    dup = d / "03-01-01-01-01-01-01.wav"
    dup.touch()
    with pytest.raises(ValueError, match="Duplicate stem"):
        build_stem_map([p1, dup])


@pytest.mark.slow
@pytest.mark.skipif(
    not Path("/root/reference/src/dataprocessing.py").exists(),
    reason="reference ETL not present; parity harness needs it",
)
def test_parity_harness_dual_etl_smoke(tmp_path):
    """scripts/parity.py stage 1+2 (CI smoke of the real-data parity
    harness, round-4 verdict item 7): generate synthetic RAVDESS media,
    run BOTH ETL pipelines — ours and the reference's own
    dataprocessing.py (librosa satisfied by the repo-resampler shim) —
    and assert split membership, order, and content parity.  Marked slow
    + reference-gated (round-4 advisor): deselect with -m 'not slow' for
    a fast hermetic unit run."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, str(root / "scripts" / "parity.py"),
         "--synthetic", "--skip-train", "--clips-per-emotion", "8",
         "--out", str(tmp_path / "parity")],
        capture_output=True, text=True, timeout=540, cwd=str(root),
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    report = json.loads(
        (tmp_path / "parity" / "parity_report.json").read_text())
    etl = report["etl_parity"]
    assert etl["failures"] == []
    for split in ("train", "val", "test"):
        assert etl[split]["labels_identical"]
        assert etl[split]["audio_max_abs_diff"] <= 5e-5
        assert etl[split]["video_max_abs_diff"] <= 2e-3
