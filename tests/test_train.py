"""Training engine: schedules, overfit-one-batch, checkpoints, early stop.

The overfit test is the port of the reference debug harness's canonical
"does the loop learn at all" probe (/root/reference/src/debug.py:64-126).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_emotion_detection_tpu.config import Config, apply_overrides
from multimodal_emotion_detection_tpu.data.loader import create_dataloaders
from multimodal_emotion_detection_tpu.training.checkpoints import (
    CheckpointManager,
    EarlyStopping,
    restore_checkpoint,
    save_checkpoint,
)
from multimodal_emotion_detection_tpu.training.loop import Trainer
from multimodal_emotion_detection_tpu.training.optim import lr_schedule


def tiny_config(**over) -> Config:
    cfg = Config()
    apply_overrides(cfg, [
        "dataset.name=synthetic",
        "dataset.modalities=[s1,s2]",
        "dataset.num_samples=48",
        "dataset.num_samples_eval=40",
        "dataset.num_classes=4",
        "dataset.batch_size=16",
        "dataset.sequence_length=6",
        "dataset.modality_dim=8",
        ("model.encoders={s1: {type: mlp, input_dim: 8, hidden_dim: 16, "
         "num_layers: 1, batch_norm: false}, s2: {type: mlp, input_dim: 8, "
         "hidden_dim: 16, num_layers: 1, batch_norm: false}}"),
        "model.output_dim=8",
        "model.hidden_dim=16",
        "training.max_epochs=2",
        "training.learning_rate=1e-2",
    ])
    for k, v in over.items():
        setattr_path(cfg, k, v)
    return cfg


def setattr_path(cfg, dotted, value):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = getattr(node, p)
    setattr(node, parts[-1], value)


def make_loaders(cfg):
    return create_dataloaders(
        cfg.dataset.name, cfg.dataset.data_dir, cfg.dataset.modalities,
        batch_size=cfg.dataset.batch_size,
        modality_dropout=cfg.training.augmentation.modality_dropout,
        seed=cfg.seed,
        num_samples=cfg.dataset.num_samples,
        num_samples_eval=cfg.dataset.num_samples_eval,
        num_classes=cfg.dataset.num_classes,
        modality_dim=cfg.dataset.modality_dim,
        sequence_length=cfg.dataset.sequence_length,
    )


# ---------------------------------------------------------------------------
def test_lr_schedules():
    cfg = Config().training
    cfg.learning_rate = 1.0
    cfg.max_epochs = 10

    cfg.scheduler = "none"
    s = lr_schedule(cfg, steps_per_epoch=5)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(49)) == pytest.approx(1.0)

    cfg.scheduler = "cosine"
    s = lr_schedule(cfg, steps_per_epoch=5)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(5 * 10)) == pytest.approx(0.01, abs=1e-6)  # eta_min=lr/100
    assert float(s(25)) == pytest.approx(0.505, abs=1e-3)  # half-way

    cfg.scheduler = "step"
    cfg.scheduler_step_size = 3
    cfg.scheduler_gamma = 0.1
    s = lr_schedule(cfg, steps_per_epoch=5)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(5 * 3)) == pytest.approx(0.1)
    assert float(s(5 * 6)) == pytest.approx(0.01)

    cfg.scheduler = "warmup_cosine"
    cfg.warmup_steps = 10
    s = lr_schedule(cfg, steps_per_epoch=5)
    assert float(s(0)) == pytest.approx(0.0, abs=1e-6)
    assert float(s(10)) == pytest.approx(1.0)


def test_trainer_fit_and_artifacts(tmp_path):
    cfg = tiny_config()
    cfg.experiment.save_dir = str(tmp_path)
    train_loader, val_loader, test_loader = make_loaders(cfg)
    trainer = Trainer(cfg, save_dir=tmp_path / "run")
    trainer.fit(train_loader, val_loader)
    assert trainer.num_params > 0
    assert len(trainer.history) == 2
    row = trainer.history[-1]
    for col in ("train/loss", "train/acc", "train/confidence_mean",
                "val/loss", "val/acc", "val/entropy", "lr-AdamW"):
        assert col in row
    # checkpoints: last + top-1
    assert (tmp_path / "run" / "checkpoints" / "last.ckpt").exists()
    assert trainer.checkpoints.best_model_path is not None
    # CSV written with reference metric columns
    csv_text = trainer.csv_logger.path.read_text()
    assert "train/loss" in csv_text and "val/entropy" in csv_text

    metrics, logits, preds, labels = trainer.test(test_loader)
    assert logits.shape[0] == test_loader.num_samples  # padding filtered
    assert 0.0 <= metrics["test/acc_agg"] <= 1.0


def test_overfit_one_batch():
    """One batch, many steps, near-perfect train accuracy (debug.py:64-126)."""
    cfg = tiny_config()
    cfg.dataset.num_samples = 16
    cfg.dataset.batch_size = 16
    cfg.training.max_epochs = 1
    cfg.training.augmentation.modality_dropout = 0.0
    train_loader, _, _ = make_loaders(cfg)

    trainer = Trainer(cfg, save_dir="/tmp/overfit_test")
    trainer._build(train_loader)
    feats, labels = train_loader.device_arrays()
    idx = jnp.arange(16, dtype=jnp.int32)
    valid = jnp.ones((16,), jnp.float32)
    key = jax.random.PRNGKey(0)
    state = trainer.state
    acc = 0.0
    for _ in range(150):
        state, metrics = trainer._train_step(state, feats, labels, idx, valid,
                                             key)
        acc = float(metrics["acc"])
        if acc > 0.98:
            break
    assert acc > 0.98, f"failed to overfit one batch: acc={acc}"


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    train_loader, val_loader, _ = make_loaders(cfg)
    trainer = Trainer(cfg, save_dir=tmp_path)
    trainer._build(train_loader)
    state = trainer.state
    save_checkpoint(tmp_path / "x.ckpt", state, {"epoch": 3})
    zero_state = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, meta = restore_checkpoint(tmp_path / "x.ckpt", zero_state)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_topk(tmp_path):
    from flax import struct

    class FakeState(struct.PyTreeNode):
        step: jnp.ndarray

    mgr = CheckpointManager(tmp_path, save_top_k=2)
    losses = [3.0, 2.0, 2.5, 1.0]
    for epoch, loss in enumerate(losses):
        mgr.on_epoch_end(FakeState(step=jnp.zeros((), jnp.int32)), epoch, loss)
    kept = sorted(p.name for p in tmp_path.glob("epoch=*.ckpt"))
    assert len(kept) == 2
    assert "epoch=3-val_loss=1.0000.ckpt" in kept
    assert "epoch=1-val_loss=2.0000.ckpt" in kept
    assert mgr.best_model_score == pytest.approx(1.0)
    assert (tmp_path / "last.ckpt").exists()


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es.update(1.0)
    assert not es.update(0.9)
    assert not es.update(0.95)  # wait 1
    assert es.update(0.92)  # wait 2 -> stop
    assert es.stopped


def test_resume(tmp_path):
    cfg = tiny_config()
    cfg.training.max_epochs = 2
    train_loader, val_loader, _ = make_loaders(cfg)
    t1 = Trainer(cfg, save_dir=tmp_path)
    t1.fit(train_loader, val_loader)
    step_after = int(jax.device_get(t1.state.step))

    cfg2 = tiny_config()
    cfg2.training.max_epochs = 4
    t2 = Trainer(cfg2, save_dir=tmp_path)
    # fresh trainer resumes from last.ckpt and continues to epoch 4
    train_loader2, val_loader2, _ = make_loaders(cfg2)
    t2.fit(train_loader2, val_loader2, resume=True)
    assert int(jax.device_get(t2.state.step)) == 2 * step_after


def test_bfloat16_compute_path():
    """compute_dtype=bfloat16 must train with finite loss (params stay f32)."""
    cfg = tiny_config()
    cfg.runtime.compute_dtype = "bfloat16"
    cfg.training.max_epochs = 1
    train_loader, val_loader, _ = make_loaders(cfg)
    trainer = Trainer(cfg, save_dir="/tmp/bf16_test")
    trainer.fit(train_loader, val_loader)
    row = trainer.history[-1]
    assert np.isfinite(row["train/loss"]) and np.isfinite(row["val/loss"])
    # parameters remain float32 master copies
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)


def test_logmel_frontend_trains():
    """Classifier with the log-mel frontend (XLA path) end to end."""
    cfg = tiny_config()
    cfg.dataset.modalities = ["audio"]
    cfg.dataset.sequence_length = 1  # unused for audio shape below
    cfg.model.encoders = {
        "audio": {"type": "sequence", "encoder_type": "gru",
                  "hidden_dim": 16, "num_layers": 1},
    }
    cfg.model.frontend.audio = "logmel"
    cfg.model.frontend.use_pallas = False
    cfg.training.max_epochs = 1

    from multimodal_emotion_detection_tpu.data.dataset import MultimodalArrays
    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader

    rng = np.random.RandomState(0)
    def loader(split_seed):
        arrays = MultimodalArrays(
            features={"audio": rng.randn(24, 4096, 1).astype(np.float32)},
            labels=rng.randint(0, 4, 24).astype(np.int32),
            modalities=["audio"],
        )
        return MultimodalLoader(arrays, batch_size=8, shuffle=True,
                                seed=split_seed)

    trainer = Trainer(cfg, save_dir="/tmp/logmel_train_test")
    trainer.fit(loader(0), loader(1))
    assert np.isfinite(trainer.history[-1]["val/loss"])


def test_reference_invariant_dropout_knobs_are_inert():
    """SURVEY.md §6 invariant: with the mask-unused concat head, neither
    model.dropout nor modality_dropout may change results under a fixed
    seed (the reference's grid runs are bitwise identical across these
    knobs — grid_sweep_results/lr0p002_*/results.json)."""
    def run(dropout, m_drop):
        cfg = tiny_config()
        cfg.model.dropout = dropout
        cfg.training.augmentation.modality_dropout = m_drop
        cfg.training.max_epochs = 2
        train_loader, val_loader, _ = make_loaders(cfg)
        trainer = Trainer(cfg, save_dir=f"/tmp/invariant_{dropout}_{m_drop}")
        trainer.fit(train_loader, val_loader)
        return [row["val/loss"] for row in trainer.history]

    base = run(0.0, 0.0)
    for dropout, m_drop in ((0.3, 0.0), (0.0, 0.1), (0.3, 0.1)):
        other = run(dropout, m_drop)
        np.testing.assert_array_equal(base, other)


def test_host_streaming_matches_device_resident():
    """device_resident=False (host streaming) must reproduce the resident
    path's trajectory exactly (same batches, same keys)."""
    def run(resident):
        cfg = tiny_config()
        cfg.dataset.device_resident = resident
        train_loader, val_loader, _ = make_loaders(cfg)
        for loader in (train_loader, val_loader):
            loader.device_resident = resident
        trainer = Trainer(cfg, save_dir=f"/tmp/stream_{resident}")
        trainer.fit(train_loader, val_loader)
        return [row["val/loss"] for row in trainer.history]

    np.testing.assert_allclose(run(True), run(False), rtol=1e-6)


@pytest.mark.parametrize("fusion_type", ["early", "late", "hybrid",
                                         "uncertainty"])
def test_library_fusion_trains_end_to_end(fusion_type):
    """train_fusion=library must train with every fusion family."""
    cfg = tiny_config()
    cfg.model.train_fusion = "library"
    cfg.model.fusion_type = fusion_type
    cfg.training.max_epochs = 1
    train_loader, val_loader, _ = make_loaders(cfg)
    trainer = Trainer(cfg, save_dir=f"/tmp/libfusion_{fusion_type}")
    trainer.fit(train_loader, val_loader)
    assert np.isfinite(trainer.history[-1]["val/loss"])


def test_train_cli_uncertainty_branch(tmp_path, monkeypatch):
    """fusion_type=uncertainty run() writes uncertainty.json + diagram."""
    monkeypatch.chdir(tmp_path)
    from multimodal_emotion_detection_tpu.train import run

    cfg = tiny_config()
    cfg.model.fusion_type = "uncertainty"
    cfg.training.max_epochs = 1
    cfg.experiment.save_dir = str(tmp_path / "out")
    cfg.outputs.experiments_dir = str(tmp_path / "experiments")
    results = run(cfg)
    import json
    report = json.loads((tmp_path / "experiments" / "uncertainty.json")
                        .read_text())
    assert report["dataset"] == "synthetic"
    cm = report["calibration_metrics"]
    assert set(cm) == {"ece", "nll", "bins", "accuracy_per_bin"}
    assert len(cm["bins"]) == cfg.evaluation.num_calibration_bins
    assert (tmp_path / "analysis" / "calibration_diagram.png").exists()
    assert "ece" in results


def test_predict_cli_mc_dropout_small_split(tmp_path, monkeypatch):
    """tools/predict.py end-to-end: restore a trained checkpoint (via the
    run's config_snapshot) and MC-dropout-eval a split SMALLER than
    batch_size.  Regression: the init template used to take batch_size
    rows of mask but only num_samples rows of features, crashing with a
    broadcast error — found running BASELINE config 5 on chip."""
    monkeypatch.chdir(tmp_path)
    from multimodal_emotion_detection_tpu.tools.predict import (
        main as predict_main,
    )
    from multimodal_emotion_detection_tpu.train import run

    cfg = tiny_config()  # synthetic test split = 40 // 5 = 8 < batch 16
    cfg.training.max_epochs = 1
    cfg.experiment.save_dir = str(tmp_path / "out")
    run(cfg)
    run_dir = tmp_path / "out" / cfg.experiment.name
    ckpt = run_dir / "best.ckpt"
    assert ckpt.exists()
    metrics = predict_main([
        "--checkpoint", str(ckpt),
        "--config", str(run_dir / "config_snapshot" / "config.yaml"),
        "--split", "test", "--mc-dropout", "2",
        "--out", str(tmp_path / "pred"),
    ])
    assert metrics["mc_dropout_samples"] == 2
    assert (tmp_path / "pred" / "metrics.json").exists()
    assert (tmp_path / "pred" / "uncertainty.npy").exists()
    preds = np.load(tmp_path / "pred" / "predictions.npy")
    assert preds.shape == (8,)


def test_orbax_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    train_loader, _, _ = make_loaders(cfg)
    trainer = Trainer(cfg, save_dir=tmp_path)
    trainer._build(train_loader)
    state = trainer.state
    save_checkpoint(tmp_path / "orbax.ckpt", state, {"epoch": 7},
                    backend="orbax")
    assert (tmp_path / "orbax.ckpt").is_dir()
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, meta = restore_checkpoint(tmp_path / "orbax.ckpt", zero)
    assert meta["epoch"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mfcc_frontend_trains():
    """audio='mfcc' end to end (log-mel + DCT feeding the encoder)."""
    cfg = tiny_config()
    cfg.dataset.modalities = ["audio"]
    cfg.model.encoders = {
        "audio": {"type": "sequence", "encoder_type": "gru",
                  "hidden_dim": 16, "num_layers": 1},
    }
    cfg.model.frontend.audio = "mfcc"
    cfg.model.frontend.n_mfcc = 13
    cfg.model.frontend.use_pallas = False
    cfg.training.max_epochs = 1

    from multimodal_emotion_detection_tpu.data.dataset import MultimodalArrays
    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader

    rng = np.random.RandomState(0)

    def loader(seed):
        arrays = MultimodalArrays(
            features={"audio": rng.randn(16, 4096, 1).astype(np.float32)},
            labels=rng.randint(0, 4, 16).astype(np.int32),
            modalities=["audio"],
        )
        return MultimodalLoader(arrays, batch_size=8, shuffle=True, seed=seed)

    trainer = Trainer(cfg, save_dir="/tmp/mfcc_train_test")
    trainer.fit(loader(0), loader(1))
    assert np.isfinite(trainer.history[-1]["val/loss"])


def test_trainer_fully_deterministic(tmp_path):
    """Same seed -> bitwise-identical history; different seed -> different."""
    def run(seed, tag):
        cfg = tiny_config()
        cfg.seed = seed
        cfg.training.max_epochs = 2
        train_loader, val_loader, _ = make_loaders(cfg)
        t = Trainer(cfg, save_dir=tmp_path / tag)
        t.fit(train_loader, val_loader)
        return [row["val/loss"] for row in t.history]

    a = run(42, "a")
    b = run(42, "b")
    c = run(43, "c")
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_epoch_scan_matches_per_step_dispatch(tmp_path):
    """runtime.epoch_scan drives the epoch as ONE lax.scan dispatch; the
    per-step metric trajectory and final history must be bit-identical to
    the per-step dispatch path (same body, same key folding)."""
    def run(mode, tag):
        cfg = tiny_config()
        cfg.training.max_epochs = 2
        cfg.runtime.epoch_scan = mode
        train_loader, val_loader, _ = make_loaders(cfg)
        t = Trainer(cfg, save_dir=tmp_path / tag)
        t.fit(train_loader, val_loader)
        assert (t._epoch_step is not None) == (mode == "on")
        return [
            (row["train/loss"], row["val/loss"], row["train/acc"])
            for row in t.history
        ]

    np.testing.assert_array_equal(run("on", "scan"), run("off", "loop"))


def test_epoch_pregather_matches_in_scan_gather(tmp_path):
    """runtime.epoch_pregather hoists the batch gather out of the scan;
    same rows in the same order -> the trajectory must be bit-identical
    to the in-scan gather path."""
    def run(pregather, tag):
        cfg = tiny_config()
        cfg.training.max_epochs = 2
        cfg.runtime.epoch_scan = "on"
        cfg.runtime.epoch_pregather = pregather
        train_loader, val_loader, _ = make_loaders(cfg)
        t = Trainer(cfg, save_dir=tmp_path / tag)
        t.fit(train_loader, val_loader)
        return [
            (row["train/loss"], row["val/loss"], row["train/acc"])
            for row in t.history
        ]

    np.testing.assert_array_equal(run(True, "pg"), run(False, "nopg"))


def test_epoch_scan_matches_per_step_with_batchnorm(tmp_path):
    """BatchNorm models thread batch_stats through the scan carry; the
    trajectory must still match the per-step path bitwise."""
    def run(mode, tag):
        cfg = tiny_config()
        cfg.training.max_epochs = 1
        cfg.runtime.epoch_scan = mode
        apply_overrides(cfg, [
            ("model.encoders={s1: {type: mlp, input_dim: 8, hidden_dim: 16, "
             "num_layers: 1, batch_norm: true}, s2: {type: mlp, input_dim: 8,"
             " hidden_dim: 16, num_layers: 1, batch_norm: true}}"),
        ])
        train_loader, val_loader, _ = make_loaders(cfg)
        t = Trainer(cfg, save_dir=tmp_path / tag)
        t.fit(train_loader, val_loader)
        assert bool(t.state.model_state), "expected batch_stats in state"
        return [
            (row["train/loss"], row["val/loss"]) for row in t.history
        ]

    np.testing.assert_array_equal(run("on", "bn_scan"), run("off", "bn_loop"))


def test_batched_forward_matches_per_batch(tmp_path):
    """make_batched_forward_fn (S microbatches, one dispatch) returns the
    same logits as S calls of make_forward_fn."""
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        make_batched_forward_fn,
        make_forward_fn,
    )
    import jax

    cfg = tiny_config()
    model = classifier_from_config(cfg)
    S, B = 3, 8
    rng = np.random.RandomState(0)
    feats = {
        m: jnp.asarray(rng.randn(S, B, 6, 8), jnp.float32)
        for m in ("s1", "s2")
    }
    sample = {m: a[0] for m, a in feats.items()}
    variables = model.init(jax.random.PRNGKey(0), sample,
                           jnp.ones((B, 2), jnp.float32),
                           deterministic=True)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    one = make_forward_fn(model, 2)
    many = make_batched_forward_fn(model, 2)
    stacked = np.asarray(many(params, model_state, feats))
    for s in range(S):
        np.testing.assert_array_equal(
            stacked[s],
            np.asarray(one(params, model_state,
                           {m: a[s] for m, a in feats.items()})),
        )


def test_epoch_scan_eval_matches_per_step(tmp_path):
    """The scanned eval driver returns identical metric sums and collected
    logits/preds/labels to the per-batch dispatch path."""
    cfg = tiny_config()
    cfg.training.max_epochs = 1
    train_loader, val_loader, test_loader = make_loaders(cfg)
    t = Trainer(cfg, save_dir=tmp_path / "e")
    t.fit(train_loader, val_loader)

    sums_scan, col_scan = t._run_eval(test_loader, collect=True)
    t._epoch_eval_step = None  # force the per-step path
    sums_loop, col_loop = t._run_eval(test_loader, collect=True)
    assert sums_scan == sums_loop
    for a, b in zip(col_scan, col_loop):
        np.testing.assert_array_equal(a, b)


def test_resume_equals_uninterrupted(tmp_path):
    """2 epochs + resume to 4 == 4 epochs straight (same seeds/keys)."""
    def fresh(max_epochs, tag, resume=False):
        cfg = tiny_config()
        cfg.training.max_epochs = max_epochs
        train_loader, val_loader, _ = make_loaders(cfg)
        t = Trainer(cfg, save_dir=tmp_path / tag)
        t.fit(train_loader, val_loader, resume=resume)
        return t

    straight = fresh(4, "straight")
    part1 = fresh(2, "resumed")
    part2 = fresh(4, "resumed", resume=True)
    np.testing.assert_allclose(
        [row["val/loss"] for row in straight.history][2:],
        [row["val/loss"] for row in part2.history],
        rtol=1e-6,
    )


def test_csv_reference_cadence(tmp_path):
    """metrics.csv mirrors the reference's Lightning row structure.

    Reference artifact (grid_sweep_results/*/metrics.csv): per epoch an
    lr row (epoch cell EMPTY, step = first global step of the epoch),
    then a val row and a train row at the epoch's last global step.
    ``experiment.log_every_n_steps`` additionally emits within-epoch
    '*_step' rows (Lightning's on_step column naming), leaving the
    epoch-level columns directly diffable.
    """
    import csv as csvmod

    cfg = tiny_config()
    cfg.training.max_epochs = 2
    cfg.experiment.log_every_n_steps = 2
    train_loader, val_loader, _ = make_loaders(cfg)
    t = Trainer(cfg, save_dir=tmp_path / "cadence")
    t.fit(train_loader, val_loader)

    rows = list(csvmod.DictReader(open(t.csv_logger.path)))
    steps_per_epoch = len(train_loader)

    lr_rows = [r for r in rows if r.get("lr-AdamW")]
    assert len(lr_rows) == 2
    assert [int(r["step"]) for r in lr_rows] == [0, steps_per_epoch]
    assert all(r["epoch"] == "" for r in lr_rows)  # empty like the ref

    val_rows = [r for r in rows if r.get("val/loss")]
    train_rows = [r for r in rows if r.get("train/loss")]
    assert len(val_rows) == 2 and len(train_rows) == 2
    for e, (vr, tr) in enumerate(zip(val_rows, train_rows)):
        assert int(vr["step"]) == steps_per_epoch * (e + 1) - 1
        assert int(tr["step"]) == steps_per_epoch * (e + 1) - 1
        assert int(vr["epoch"]) == e and int(tr["epoch"]) == e
        assert vr.get("train/loss", "") == ""  # sparse, like Lightning

    step_rows = [r for r in rows if r.get("train/loss_step")]
    # cadence 2 over 2 epochs x steps_per_epoch steps
    assert len(step_rows) == (2 * steps_per_epoch) // 2
    assert all(r.get("val/loss", "") == "" for r in step_rows)


def test_bf16_compute_matches_fp32_metrics(tmp_path):
    """bf16 compute (params fp32) reaches fp32-level metrics end-to-end.

    configs/fast.yaml ships runtime.compute_dtype=bfloat16 for the
    benchmark headline; this audits that the speed dtype does not cost
    accuracy on the synthetic end-to-end task (VERDICT round-1 weak #5):
    final val accuracy within 0.05 absolute and val loss within 15%
    relative of the fp32 run over the same data and seeds.
    """
    def run(dtype, tag):
        cfg = tiny_config()
        cfg.training.max_epochs = 4
        cfg.runtime.compute_dtype = dtype
        train_loader, val_loader, _ = make_loaders(cfg)
        t = Trainer(cfg, save_dir=tmp_path / tag)
        t.fit(train_loader, val_loader)
        return t.history[-1]

    fp32 = run("float32", "fp32")
    bf16 = run("bfloat16", "bf16")
    assert abs(bf16["val/acc"] - fp32["val/acc"]) <= 0.05, (fp32, bf16)
    assert abs(bf16["val/loss"] - fp32["val/loss"]) <= 0.15 * fp32["val/loss"]


def test_cached_frontend_matches_per_step_frontend(tmp_path):
    """frontend.cache=true == the in-graph per-step frontend, bitwise-level.

    The frontend is parameter-free and deterministic, so precomputing the
    features once per split (the round-2 throughput lever,
    benchmarks/r2f_tpu.json) must not change a single metric.  Trains the
    same data with both wirings and compares full metric histories.
    """
    from multimodal_emotion_detection_tpu.data.dataset import MultimodalArrays
    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader

    def build_cfg(cache):
        cfg = tiny_config()
        cfg.dataset.modalities = ["audio"]
        cfg.model.encoders = {
            "audio": {"type": "sequence", "encoder_type": "lstm",
                      "hidden_dim": 16, "num_layers": 2},
        }
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.use_pallas = False
        cfg.model.frontend.cache = cache
        cfg.training.max_epochs = 2
        return cfg

    rng = np.random.RandomState(7)
    raw = rng.randn(24, 4096, 1).astype(np.float32)
    labels = rng.randint(0, 4, 24).astype(np.int32)

    def loaders():
        def one(seed):
            arrays = MultimodalArrays(
                features={"audio": raw.copy()}, labels=labels.copy(),
                modalities=["audio"],
            )
            return MultimodalLoader(arrays, batch_size=8, shuffle=True,
                                    seed=seed)
        return one(0), one(1)

    histories = {}
    for cache in (False, True):
        tr, va = loaders()
        t = Trainer(build_cfg(cache), save_dir=tmp_path / f"cache_{cache}")
        t.fit(tr, va)
        histories[cache] = t.history
        if cache:
            # the cache actually happened: raw audio was replaced
            assert tr.arrays.features["audio"].shape[1:] != raw.shape[1:]

    for row_a, row_b in zip(histories[False], histories[True]):
        for key in ("train/loss", "val/loss", "train/acc", "val/acc"):
            np.testing.assert_allclose(row_a[key], row_b[key], rtol=1e-6,
                                       err_msg=key)


def test_cached_frontend_checkpoint_compatible():
    """cache=true and cache=false build IDENTICAL parameter trees.

    The frontend holds no parameters, so a checkpoint trained with cached
    features restores into the in-graph-frontend model (what
    tools/predict.py, export.py and debug.py rebuild for raw inputs).
    """
    import jax

    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )

    def build(cache):
        cfg = tiny_config()
        cfg.dataset.modalities = ["audio"]
        cfg.model.encoders = {
            "audio": {"type": "sequence", "encoder_type": "lstm",
                      "hidden_dim": 16, "num_layers": 2},
        }
        cfg.model.frontend.audio = "logmel"
        cfg.model.frontend.use_pallas = False
        cfg.model.frontend.cache = cache
        model = classifier_from_config(cfg)
        if cache:
            feats = {"audio": jnp.zeros((4, 31, 64))}  # precomputed shape
        else:
            feats = {"audio": jnp.zeros((4, 4096, 1))}  # raw waveform
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
        return variables["params"]

    cached, raw = build(True), build(False)
    flat_c = jax.tree_util.tree_flatten_with_path(cached)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(raw)[0]
    assert [(p, v.shape) for p, v in flat_c] == [
        (p, v.shape) for p, v in flat_r
    ]


def test_orbax_restore_reshards_onto_new_mesh(tmp_path):
    """Save a TP-sharded state from one mesh, restore directly onto a
    DIFFERENT mesh layout: values identical, leaves land with the target
    mesh's shardings (no host gather in between)."""
    from jax.sharding import Mesh, NamedSharding

    from multimodal_emotion_detection_tpu.parallel.sharding import (
        shard_state,
    )

    cfg = tiny_config()
    train_loader, _, _ = make_loaders(cfg)
    trainer = Trainer(cfg, save_dir=tmp_path)
    trainer._build(train_loader)
    devices = np.array(jax.devices()[:8])

    mesh_a = Mesh(devices.reshape(2, 4), ("data", "model"))
    state_a = shard_state(trainer.state, mesh_a, min_shard_dim=8)
    save_checkpoint(tmp_path / "sharded.ckpt", state_a, {"epoch": 3},
                    backend="orbax")

    mesh_b = Mesh(devices.reshape(4, 2), ("data", "model"))
    target = shard_state(
        jax.tree_util.tree_map(jnp.zeros_like, trainer.state),
        mesh_b, min_shard_dim=8,
    )
    restored, meta = restore_checkpoint(tmp_path / "sharded.ckpt", target)
    assert meta["epoch"] == 3
    for want, got in zip(jax.tree_util.tree_leaves(state_a.params),
                         jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        assert isinstance(got.sharding, NamedSharding)
        assert got.sharding.mesh.shape["model"] == 2


def test_checkpoint_manager_orbax_backend(tmp_path):
    """Top-k pruning, best copy, and resume work with directory (orbax)
    checkpoints.  'auto' keeps msgpack on single-process meshes (the
    reference artifact contract needs files); orbax engages only when a
    host gather is impossible (multi-process) or explicitly configured."""
    from multimodal_emotion_detection_tpu.training.checkpoints import (
        CheckpointManager,
    )

    cfg = tiny_config()
    train_loader, _, _ = make_loaders(cfg)
    trainer = Trainer(cfg, save_dir=tmp_path)
    trainer._build(train_loader)
    assert trainer.checkpoints.backend == "msgpack"  # single process

    mgr = CheckpointManager(tmp_path / "ckpts", save_top_k=2,
                            backend="orbax")
    for epoch, loss in enumerate([3.0, 2.0, 1.0]):
        mgr.on_epoch_end(trainer.state, epoch, loss)
    kept = sorted(p.name for p in (tmp_path / "ckpts").glob("epoch=*.ckpt"))
    assert kept == ["epoch=1-val_loss=2.0000.ckpt",
                    "epoch=2-val_loss=1.0000.ckpt"]  # epoch 0 pruned
    assert all((tmp_path / "ckpts" / n).is_dir() for n in kept)
    best = mgr.copy_best(tmp_path / "best.ckpt")
    assert best is not None and best.is_dir()
    zero = jax.tree_util.tree_map(jnp.zeros_like, trainer.state)
    restored, meta = restore_checkpoint(tmp_path / "best.ckpt", zero)
    assert meta["val_loss"] == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_recovered_name_collision(tmp_path):
    """Re-running a deterministic config over an existing checkpoints dir:
    a new best whose 4-decimal filename matches a RECOVERED top-k entry
    must replace it — previously the duplicate-path pair got pruned and
    deleted the file best_model_path pointed to (hit by the sweep-corpus
    regeneration)."""
    from flax import struct

    class FakeState(struct.PyTreeNode):
        step: jnp.ndarray

    st = FakeState(step=jnp.zeros((), jnp.int32))
    m1 = CheckpointManager(tmp_path, save_top_k=1)
    m1.on_epoch_end(st, 6, 0.17672)  # -> epoch=6-val_loss=0.1767.ckpt

    # fresh manager recovers the file (metric parsed from the name), then
    # the re-run produces an infinitesimally better value, SAME filename
    m2 = CheckpointManager(tmp_path, save_top_k=1)
    assert m2.best_model_path is not None
    m2.on_epoch_end(st, 6, 0.17668)
    assert m2.best_model_path.exists()
    restored, meta = restore_checkpoint(m2.best_model_path, st)
    assert meta["epoch"] == 6
    # and a later better epoch still prunes the old file correctly
    m2.on_epoch_end(st, 7, 0.1000)
    assert m2.best_model_path.name == "epoch=7-val_loss=0.1000.ckpt"
    assert m2.best_model_path.exists()
    assert not (tmp_path / "epoch=6-val_loss=0.1767.ckpt").exists()


def test_lstm_residual_dtype_config_plumbed(tmp_path):
    """runtime.lstm_residual_dtype reaches the trace-time kernel switch
    when the Trainer builds (the kernels themselves only engage on TPU;
    this pins the config->set_res2_dtype wiring)."""
    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    cfg = tiny_config()
    cfg.runtime.lstm_residual_dtype = "bfloat16"
    cfg.training.max_epochs = 1
    train_loader, val_loader, _ = make_loaders(cfg)
    prev = lv._RES2_DTYPE
    try:
        t = Trainer(cfg, save_dir=tmp_path)
        t.fit(train_loader, val_loader)
        assert lv._RES2_DTYPE == "bfloat16"
    finally:
        lv.set_res2_dtype(prev)


def test_val_every_n_epochs_block_driver_bitwise(tmp_path):
    """training.val_every_n_epochs=3 dispatches each 3-epoch block as ONE
    scan-of-scans program.  Per-epoch TRAIN metrics must be bit-identical
    to the per-epoch driver, and the val metrics it does produce (block
    boundaries) must equal the per-epoch run's val metrics at those
    epochs (same state trajectory)."""
    def run(val_every, tag):
        cfg = tiny_config()
        cfg.training.max_epochs = 6
        cfg.training.val_every_n_epochs = val_every
        cfg.runtime.epoch_scan = "on"
        train_loader, val_loader, _ = make_loaders(cfg)
        t = Trainer(cfg, save_dir=tmp_path / tag)
        t.fit(train_loader, val_loader)
        return t.history

    h1 = run(1, "every")
    h3 = run(3, "block")
    assert len(h1) == len(h3) == 6
    for r1, r3 in zip(h1, h3):
        assert r1["train/loss"] == r3["train/loss"]
        assert r1["train/acc"] == r3["train/acc"]
    # val rows only at block boundaries (epochs 2 and 5), equal to the
    # per-epoch run's values there
    for e, r3 in enumerate(h3):
        if e in (2, 5):
            assert r3["val/loss"] == h1[e]["val/loss"]
            assert r3["val/acc"] == h1[e]["val/acc"]
        else:
            assert "val/loss" not in r3


def test_val_every_n_epochs_ragged_final_block(tmp_path):
    """max_epochs not a multiple of the block size: the final short block
    still trains, validates, and checkpoints."""
    cfg = tiny_config()
    cfg.training.max_epochs = 5
    cfg.training.val_every_n_epochs = 3
    cfg.runtime.epoch_scan = "on"
    train_loader, val_loader, _ = make_loaders(cfg)
    t = Trainer(cfg, save_dir=tmp_path)
    t.fit(train_loader, val_loader)
    assert len(t.history) == 5
    assert "val/loss" in t.history[2] and "val/loss" in t.history[4]
    assert t.checkpoints.best_model_path is not None


def test_val_every_n_epochs_cadence_without_block_driver(tmp_path):
    """With runtime.epoch_scan='off' the block driver cannot build, but
    the validation CADENCE must hold: val/checkpoint/patience on the
    same epochs as the block driver would produce, via blk=1 dispatches
    (a perf-driver availability condition must not change training
    behavior)."""
    cfg = tiny_config()
    cfg.training.max_epochs = 6
    cfg.training.val_every_n_epochs = 3
    cfg.runtime.epoch_scan = "off"
    train_loader, val_loader, _ = make_loaders(cfg)
    t = Trainer(cfg, save_dir=tmp_path)
    t.fit(train_loader, val_loader)
    assert t._multi_epoch_step is None  # fallback actually exercised
    assert len(t.history) == 6
    for e, row in enumerate(t.history):
        if e in (2, 5):
            assert "val/loss" in row
        else:
            assert "val/loss" not in row


def test_val_every_n_epochs_early_stop_counts_val_checks(tmp_path):
    """Early-stopping patience counts VALIDATION checks (Lightning
    semantics), so with val_every_n_epochs=2 and patience=2 the run can
    stop only at a block boundary."""
    cfg = tiny_config()
    cfg.training.max_epochs = 20
    cfg.training.val_every_n_epochs = 2
    cfg.training.early_stopping_patience = 2
    cfg.training.learning_rate = 0.0  # no progress -> patience exhausts
    cfg.runtime.epoch_scan = "on"
    train_loader, val_loader, _ = make_loaders(cfg)
    t = Trainer(cfg, save_dir=tmp_path)
    t.fit(train_loader, val_loader)
    stopped_at = t.history[-1]["epoch"]
    assert stopped_at < 19  # actually stopped early
    assert (stopped_at + 1) % 2 == 0  # at a block boundary
