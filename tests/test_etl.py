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
from multimodal_emotion_detection_tpu.utils.wav import load_audio, read_wav


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
