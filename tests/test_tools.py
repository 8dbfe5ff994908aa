"""Tooling: curve plotter, CSV/TB loggers, attention visualizer, utils."""

import csv
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def test_plot_curves_from_csv(tmp_path):
    from multimodal_emotion_detection_tpu.tools.plot_curves import plot_curves

    path = tmp_path / "metrics.csv"
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=[
            "epoch", "step", "train/loss", "train/acc", "val/loss", "val/acc",
        ])
        writer.writeheader()
        for e in range(5):
            writer.writerow({
                "epoch": e, "step": e * 10,
                "train/loss": 2.0 - 0.1 * e, "train/acc": 0.2 + 0.1 * e,
                "val/loss": 2.1 - 0.1 * e, "val/acc": 0.15 + 0.1 * e,
            })
    out = plot_curves(str(path))
    assert Path(out).exists() and Path(out).stat().st_size > 0


def test_csv_logger_grows_columns(tmp_path):
    from multimodal_emotion_detection_tpu.utils.logging import CSVLogger

    logger = CSVLogger(tmp_path)
    logger.log_metrics({"train/loss": 1.0}, step=1, epoch=0)
    logger.log_metrics({"train/loss": 0.9, "val/loss": 1.1}, step=2, epoch=1)
    rows = list(csv.DictReader(open(logger.path)))
    assert rows[0]["val/loss"] == ""  # earlier rows get blank new columns
    assert rows[1]["val/loss"] == "1.1"
    # version directories increment
    logger2 = CSVLogger(tmp_path)
    assert logger2.log_dir.name == "version_1"


def test_visualize_attention_writes(tmp_path):
    from multimodal_emotion_detection_tpu.models.attention import (
        visualize_attention,
    )

    attn = np.random.RandomState(0).rand(2, 4, 2, 2)  # (B, H, M, M)
    out = tmp_path / "attn.png"
    visualize_attention(attn, ["audio", "video"], save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_param_summary_and_counts():
    from multimodal_emotion_detection_tpu.utils.tree import (
        count_params,
        param_summary,
    )

    params = {
        "encoder": {"w": jnp.zeros((4, 8)), "b": jnp.zeros((8,))},
        "head": {"w": jnp.zeros((8, 2))},
    }
    assert count_params(params) == 4 * 8 + 8 + 8 * 2
    text = param_summary(params)
    assert "encoder: 40 params" in text
    assert "Total parameters: 56" in text


def test_step_timer():
    import time

    from multimodal_emotion_detection_tpu.utils.logging import StepTimer

    t = StepTimer()
    t.start()
    time.sleep(0.01)
    t.stop(num_samples=100)
    assert t.samples_per_sec > 0
    assert t.elapsed >= 0.01


def test_epoch_key_pure_function():
    from multimodal_emotion_detection_tpu.utils.prng import epoch_key

    k1 = epoch_key(42, 3)
    k2 = epoch_key(42, 3)
    k3 = epoch_key(42, 4)
    assert jnp.array_equal(k1, k2)
    assert not jnp.array_equal(k1, k3)


def test_debug_nans_flag_roundtrip():
    """runtime.debug_nans enables jit-time NaN checking without breaking
    clean computations (the 'sanitizer' debug config, SURVEY.md §5)."""
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    try:
        setup_jax(debug_nans=True)
        out = jax.jit(lambda x: x * 2)(jnp.ones((4,)))
        assert bool(jnp.isfinite(out).all())
    finally:
        jax.config.update("jax_debug_nans", False)


def test_maybe_initialize_noop_and_env(monkeypatch):
    from multimodal_emotion_detection_tpu.parallel.distributed import (
        maybe_initialize,
        process_info,
    )

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_AUTO_DISTRIBUTED", raising=False)
    assert maybe_initialize() is False  # single-host: no-op
    info = process_info()
    assert info["process_index"] == 0 and info["process_count"] == 1
    assert info["global_devices"] == 8  # virtual mesh


def test_sequential_sweep_driver(tmp_path, monkeypatch):
    """run_sweep: 1x1x1 grid produces the tag dir + harvested artifacts."""
    monkeypatch.chdir(tmp_path)
    from multimodal_emotion_detection_tpu.tools.sweep import (
        format_tag,
        run_sweep,
    )
    from tests.test_train import tiny_config

    # the reference's tag literals keep "0p0" for 0.0
    # (grid_sweep_results/lr0p0005_drop0p0_mDrop0p0)
    assert format_tag(5e-4, 0.0, 0.1) == "lr0p0005_drop0p0_mDrop0p1"
    assert format_tag(1e-3, 0.0, 0.05) == "lr0p001_drop0p0_mDrop0p05"

    cfg = tiny_config()
    cfg.training.max_epochs = 1
    cfg.experiment.save_dir = str(tmp_path / "outputs")
    results = run_sweep(
        cfg, learning_rates=[1e-3], dropouts=[0.0], modality_dropouts=[0.0],
        out_root=str(tmp_path / "grid"),
    )
    assert len(results) == 1
    tag_dir = tmp_path / "grid" / results[0]["tag"]
    assert (tag_dir / "hyperparams.txt").exists()
    assert (tag_dir / "results.json").exists()
    assert (tag_dir / "metrics.csv").exists()
    assert (tag_dir / "best.ckpt").exists()
    assert (tmp_path / "grid" / "sweep_summary.json").exists()


def test_csv_logger_append_only_io(tmp_path):
    """Row appends must NOT rewrite the file (round-3 advisor finding:
    O(rows²) IO); a full rewrite happens only when the column set grows."""
    from multimodal_emotion_detection_tpu.utils.logging import CSVLogger

    logger = CSVLogger(tmp_path)
    logger.log_metrics({"train/loss": 1.0}, step=1, epoch=0)
    first = logger._rewrites
    for i in range(50):
        logger.log_metrics({"train/loss": 1.0 - i * 0.01}, step=2 + i,
                           epoch=0)
    assert logger._rewrites == first  # same columns -> appends only
    logger.log_metrics({"train/loss": 0.4, "val/loss": 0.5}, step=99,
                       epoch=1)
    assert logger._rewrites == first + 1  # column growth -> one rewrite
    rows = list(csv.DictReader(open(logger.path)))
    assert len(rows) == 52
    assert rows[0]["val/loss"] == "" and rows[-1]["val/loss"] == "0.5"
    assert rows[10]["train/loss"] == f"{1.0 - 9 * 0.01}"
