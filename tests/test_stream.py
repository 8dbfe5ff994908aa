"""Streaming / sliding-window inference (tools/stream.py).

A framework addition beyond the reference (its inference is a Lightning
test loop over pre-cut clips — SURVEY.md §3.3): these tests pin the
windowing math, the EMA smoothing contract, and the CLI end-to-end on a
trained checkpoint.
"""

import json

import numpy as np

from multimodal_emotion_detection_tpu.tools.stream import (
    ema_smooth,
    sliding_windows,
)
from tests.test_train import tiny_config


def test_sliding_windows_shapes_and_values():
    arr = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    w = sliding_windows(arr, window=4, hop=2)
    assert w.shape == (4, 4, 3)  # starts 0,2,4,6
    np.testing.assert_array_equal(w[0], arr[0:4])
    np.testing.assert_array_equal(w[3], arr[6:10])
    # too-short stream zero-pads to one full window
    short = sliding_windows(arr[:2], window=4, hop=2)
    assert short.shape == (1, 4, 3)
    np.testing.assert_array_equal(short[0, :2], arr[:2])
    np.testing.assert_array_equal(short[0, 2:], 0.0)


def test_ema_smooth_contract():
    p = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    # alpha=1 -> identity
    np.testing.assert_array_equal(ema_smooth(p, 1.0), p)
    s = ema_smooth(p, 0.5)
    np.testing.assert_allclose(s[0], [1.0, 0.0])
    np.testing.assert_allclose(s[1], [0.5, 0.5])
    np.testing.assert_allclose(s[2], [0.25, 0.75])
    # rows stay distributions
    np.testing.assert_allclose(s.sum(-1), 1.0)


def test_stream_cli_end_to_end(tmp_path, monkeypatch):
    """train a tiny model -> stream two long modality arrays through the
    CLI -> timeline/probs artifacts with the right window count; EMA
    smoothing reduces label churn (or at least changes the probs)."""
    monkeypatch.chdir(tmp_path)
    from multimodal_emotion_detection_tpu.tools.stream import (
        main as stream_main,
    )
    from multimodal_emotion_detection_tpu.train import run

    cfg = tiny_config()  # synthetic: s1/s2, dim 8, sequence_length 6
    cfg.training.max_epochs = 1
    cfg.experiment.save_dir = str(tmp_path / "out")
    run(cfg)
    run_dir = tmp_path / "out" / cfg.experiment.name
    ckpt = str(run_dir / "best.ckpt")
    snap = str(run_dir / "config_snapshot" / "config.yaml")

    rng = np.random.RandomState(0)
    t_total = 30
    np.save(tmp_path / "s1.npy", rng.randn(t_total, 8).astype(np.float32))
    np.save(tmp_path / "s2.npy", rng.randn(t_total, 8).astype(np.float32))

    summary = stream_main([
        "--checkpoint", ckpt, "--config", snap,
        "--input", f"s1={tmp_path}/s1.npy",
        "--input", f"s2={tmp_path}/s2.npy",
        "--hop", "s1=2", "--hop", "s2=2",
        "--smooth", "0.5", "--microbatch", "8",
        "--out", str(tmp_path / "stream_out"),
    ])
    # window defaults to dataset.sequence_length=6; starts 0,2,...,24
    assert summary["windows"] == 13
    assert summary["window"] == {"s1": 6, "s2": 6}
    probs = np.load(tmp_path / "stream_out" / "probs.npy")
    preds = np.load(tmp_path / "stream_out" / "predictions.npy")
    assert probs.shape == (13, cfg.dataset.num_classes)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert preds.shape == (13,)
    lines = (tmp_path / "stream_out" / "timeline.csv").read_text()
    assert len(lines.strip().splitlines()) == 14  # header + 13 windows
    report = json.loads(
        (tmp_path / "stream_out" / "summary.json").read_text())
    assert report["hop"] == {"s1": 2, "s2": 2}

    # smoothing must actually engage: alpha=1 run differs from alpha=0.5
    stream_main([
        "--checkpoint", ckpt, "--config", snap,
        "--input", f"s1={tmp_path}/s1.npy",
        "--input", f"s2={tmp_path}/s2.npy",
        "--hop", "s1=2", "--hop", "s2=2",
        "--smooth", "1.0", "--microbatch", "8",
        "--out", str(tmp_path / "stream_raw"),
    ])
    probs_raw = np.load(tmp_path / "stream_raw" / "probs.npy")
    # exact contract, never vacuous: the smoothed CLI output must equal
    # EMA(raw CLI output) — holds even if the tiny model's probs are
    # (near-)constant across windows
    np.testing.assert_allclose(probs, ema_smooth(probs_raw, 0.5),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(probs[0], probs_raw[0])  # same first window
