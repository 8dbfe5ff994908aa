"""Config system: defaults, YAML, overrides, unknown-key rejection, snapshot."""

from pathlib import Path

import pytest

from multimodal_emotion_detection_tpu.config import (
    Config,
    ConfigError,
    apply_overrides,
    config_to_dict,
    load_config,
    snapshot_config,
)

REPO_BASE_YAML = Path(__file__).resolve().parents[1] / "configs" / "base.yaml"


def test_defaults_match_reference_schema():
    cfg = Config()
    assert cfg.seed == 42
    assert cfg.experiment.name == "ravdess_audio_video_baseline"
    assert cfg.dataset.modalities == ["audio", "video"]
    assert cfg.dataset.batch_size == 32
    assert cfg.dataset.num_classes == 8
    assert cfg.model.output_dim == 128
    assert cfg.model.fusion_type == "early"
    assert cfg.training.optimizer == "adamw"
    assert cfg.training.learning_rate == pytest.approx(1e-3)
    assert cfg.training.augmentation.modality_dropout == pytest.approx(0.1)
    assert cfg.evaluation.num_calibration_bins == 15


def test_load_repo_base_yaml():
    cfg = load_config(str(REPO_BASE_YAML))
    assert cfg.model.encoders["audio"]["encoder_type"] == "lstm"
    assert cfg.model.encoders["video"]["input_dim"] == 4096
    assert cfg.model.frontend.hop_length == 128


def test_dotted_overrides_typed():
    cfg = Config()
    apply_overrides(cfg, [
        "training.learning_rate=5e-4",
        "dataset.batch_size=64",
        "model.encoders.audio.hidden_dim=512",
        "dataset.modalities=[audio]",
        "runtime.compute_dtype=bfloat16",
    ])
    assert cfg.training.learning_rate == pytest.approx(5e-4)
    assert cfg.dataset.batch_size == 64
    assert cfg.model.encoders["audio"]["hidden_dim"] == 512
    assert cfg.dataset.modalities == ["audio"]
    assert cfg.runtime.compute_dtype == "bfloat16"


def test_yaml11_bool_token_lands_as_string_switch():
    """CLI ``runtime.epoch_scan=on`` YAML-parses to True before coercion;
    string-typed switches must get 'on'/'off' back, not a bool."""
    cfg = Config()
    apply_overrides(cfg, ["runtime.epoch_scan=on"])
    assert cfg.runtime.epoch_scan == "on"
    apply_overrides(cfg, ["runtime.epoch_scan=off"])
    assert cfg.runtime.epoch_scan == "off"
    apply_overrides(cfg, ["runtime.epoch_scan=auto"])
    assert cfg.runtime.epoch_scan == "auto"
    # bool-typed keys still take bool tokens
    apply_overrides(cfg, ["runtime.epoch_pregather=true"])
    assert cfg.runtime.epoch_pregather is True


def test_unknown_key_rejected():
    cfg = Config()
    with pytest.raises(ConfigError, match="Unknown config key"):
        apply_overrides(cfg, ["training.warmup_stepz=200"])
    with pytest.raises(ConfigError, match="Unknown config key"):
        apply_overrides(cfg, ["no_such_section.x=1"])


def test_warmup_cosine_supported():
    # the reference *rejects* this override (slurm_48610692.err); we support it
    cfg = Config()
    apply_overrides(
        cfg, ["training.scheduler=warmup_cosine", "training.warmup_steps=200"]
    )
    assert cfg.training.warmup_steps == 200


def test_type_mismatch_rejected():
    cfg = Config()
    with pytest.raises(ConfigError, match="expects an int"):
        apply_overrides(cfg, ["dataset.batch_size=hello"])


def test_open_encoder_dict_accepts_new_modalities():
    cfg = Config()
    apply_overrides(cfg, ["model.encoders.imu={type: sequence, input_dim: 6}"])
    assert cfg.model.encoders["imu"]["type"] == "sequence"
    # existing sub-keys merge rather than replace
    apply_overrides(cfg, ["model.encoders.audio.num_layers=3"])
    assert cfg.model.encoders["audio"]["num_layers"] == 3
    assert cfg.model.encoders["audio"]["encoder_type"] == "lstm"


def test_snapshot_roundtrip(tmp_path):
    cfg = Config()
    overrides = ["training.learning_rate=2e-3"]
    apply_overrides(cfg, overrides)
    snap = snapshot_config(cfg, tmp_path, overrides)
    assert (snap / "config.yaml").exists()
    reloaded = load_config(str(snap / "config.yaml"))
    assert config_to_dict(reloaded) == config_to_dict(cfg)
    assert "training.learning_rate=2e-3" in (snap / "overrides.yaml").read_text()


def test_nested_dataclass_merge_and_frontend():
    cfg = load_config(None, [
        "model.frontend.audio=mfcc",
        "model.frontend.n_mfcc=20",
        "parallel.model_parallel=2",
        "runtime.profile_dir=/tmp/prof",
    ])
    assert cfg.model.frontend.audio == "mfcc"
    assert cfg.model.frontend.n_mfcc == 20
    assert cfg.parallel.model_parallel == 2
    assert cfg.runtime.profile_dir == "/tmp/prof"


def test_list_and_null_values():
    cfg = Config()
    apply_overrides(cfg, ["model.frontend.fmax=null"])
    assert cfg.model.frontend.fmax is None
    apply_overrides(cfg, ["model.frontend.fmax=7600"])
    assert cfg.model.frontend.fmax == 7600.0


def test_fast_yaml_loads():
    fast = Path(__file__).resolve().parents[1] / "configs" / "fast.yaml"
    cfg = load_config(str(fast))
    # round-3 fast regime: b32 f32 recurrence kernels + bf16 residual
    # streams + rbg PRNG (benchmarks/r3f/r3g)
    assert cfg.runtime.compute_dtype == "float32"
    assert cfg.runtime.lstm_residual_dtype == "bfloat16"
    assert cfg.runtime.prng_impl == "rbg"
    assert cfg.dataset.batch_size == 32
    assert cfg.model.train_fusion == "library"
    assert cfg.model.encoders["audio"]["scan_unroll"] == 4
    # r3j: 10-epoch val blocks as one dispatch; patience counts val checks
    assert cfg.training.val_every_n_epochs == 10
    assert cfg.training.early_stopping_patience == 3


def test_train_cli_arg_parsing():
    from multimodal_emotion_detection_tpu.train import parse_args

    args = parse_args(["--config", "c.yaml", "--resume",
                       "training.learning_rate=1e-4", "seed=7"])
    assert args.config == "c.yaml" and args.resume
    assert args.overrides == ["training.learning_rate=1e-4", "seed=7"]
    args2 = parse_args([])
    assert args2.config is None and not args2.resume
