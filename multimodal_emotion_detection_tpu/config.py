"""Config system: dataclass tree + YAML + ``a.b.c=value`` CLI overrides.

Replaces the reference's Hydra/OmegaConf stack (entry decorators at
/root/reference/src/train.py:458 and debug.py:233) with a dependency-free
equivalent that keeps the exact YAML schema of
/root/reference/configs/base.yaml so sweep semantics carry over:

* one YAML tree ``seed / experiment / dataset / model / training /
  evaluation / outputs`` plus TPU-only additions (``parallel``, ``runtime``);
* dotted CLI overrides (``training.learning_rate=5e-4``) with YAML-typed
  values;
* struct-mode behaviour: unknown keys are rejected with a clear error (the
  reference rejects ``training.warmup_steps`` — see
  /root/reference/slurm/slurm_48610692.err — we instead *support* warmup);
* per-run snapshot of the resolved config + overrides (Hydra's ``.hydra/``
  contract, written as ``<run_dir>/config_snapshot/``).

Per-modality encoder configs stay open dictionaries (mirroring the dicts fed
to ``build_encoder`` at /root/reference/src/encoders.py:532) because their
keys depend on the encoder type; they are validated by the encoder factory.
"""

from __future__ import annotations

import copy
import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


class ConfigError(ValueError):
    """Raised for unknown keys or malformed override strings."""


# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------


@dataclass
class ExperimentConfig:
    name: str = "ravdess_audio_video_baseline"
    save_dir: str = "./outputs"
    save_top_k: int = 1
    log_every_n_steps: int = 50


@dataclass
class DatasetConfig:
    name: str = "ravdess"  # anything != 'synthetic' -> on-disk .npy dataset
    data_dir: str = "../multimodal-dataset"
    modalities: List[str] = field(default_factory=lambda: ["audio", "video"])
    batch_size: int = 32
    num_workers: int = 4  # kept for schema parity; loading is device-resident
    num_classes: int = 8
    # synthetic-dataset knobs (create_dataloaders kwargs in the reference,
    # /root/reference/src/data.py:238-257)
    num_samples: int = 10000
    num_samples_eval: int = 2000  # val/test get num_samples_eval // 5 rows
    modality_dim: int = 32
    sequence_length: int = 100
    # If true, keep the full split resident in device HBM and gather batches
    # inside the jitted step (TPU-native path). Set false to stream from host.
    device_resident: bool = True
    # Memory-map on-disk .npy splits instead of reading into host RAM.
    # With parallel.shard_data_rows only each shard's rows are paged in,
    # so the split may exceed host RAM (pod-scale loading path).
    mmap: bool = False


@dataclass
class FrontendConfig:
    """On-device audio feature frontend (Pallas/XLA).

    ``audio="raw"`` reproduces the reference exactly: the encoder consumes
    the raw ``(B, 48000, 1)`` waveform (/root/reference/src/dataprocessing.py:53-55).
    ``audio="logmel"`` is the TPU performance path: a fused Pallas
    frame+window+DFT+mel+log kernel collapses T 48000 -> ~300 frames before
    any recurrence, which is where the throughput target is won.
    """

    audio: str = "raw"  # 'raw' | 'logmel' | 'mfcc'
    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 128  # = TPU lane width (Pallas path requires 128)
    win_length: int = 400
    n_mels: int = 64
    fmin: float = 0.0
    fmax: Optional[float] = None  # None -> sample_rate / 2
    log_epsilon: float = 1e-6
    n_mfcc: int = 40  # only for audio='mfcc'
    # on-device video transform: 'none' expects ETL-flattened frames;
    # 'resize' accepts raw (B, T, H, W[, 3]) frames and applies BGR->gray +
    # exact-area resize + [0,1] scaling + flatten on the accelerator
    video: str = "none"  # 'none' | 'resize'
    video_height: int = 64
    video_width: int = 64
    use_pallas: bool = True  # fall back to pure-XLA path off-TPU
    # Precompute the audio features ONCE per split (device-resident path)
    # instead of inside every train step.  The frontend is parameter-free
    # and deterministic, so numerics are identical; at the flagship shape
    # it is ~35% of the step (benchmarks/r2f_tpu.json), so caching is the
    # single largest throughput lever.  Checkpoints are unaffected (the
    # frontend holds no parameters).
    cache: bool = False


@dataclass
class ModelConfig:
    output_dim: int = 128
    fusion_type: str = "early"
    hidden_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.3
    # Reference quirk #1 (SURVEY.md §2): the active training path bypasses
    # build_fusion_model and uses a plain concat + 2-layer head
    # (/root/reference/src/train.py:68-85).  'concat' reproduces that;
    # 'library' routes training through the fusion library (the deliberate
    # fix, documented divergence).
    train_fusion: str = "concat"  # 'concat' | 'library'
    # Reference quirk #2: forward() ignores the modality mask
    # (/root/reference/src/train.py:121-164).  False reproduces that
    # bitwise-reproducibility invariant; True applies the mask.
    use_modality_mask: bool = False
    encoders: Dict[str, Dict[str, Any]] = field(
        default_factory=lambda: {
            "audio": {
                "type": "sequence",
                "input_dim": 1,
                "encoder_type": "lstm",
                "hidden_dim": 256,
                "output_dim": 128,
                "num_layers": 2,
                "dropout": 0.1,
            },
            "video": {
                "type": "frame",
                "input_dim": 4096,
                "temporal_pooling": "attention",
                "hidden_dim": 256,
                "output_dim": 128,
                "dropout": 0.1,
            },
        }
    )
    frontend: FrontendConfig = field(default_factory=FrontendConfig)


@dataclass
class AugmentationConfig:
    modality_dropout: float = 0.1


@dataclass
class TrainingConfig:
    optimizer: str = "adamw"  # 'adamw' | 'adam'
    learning_rate: float = 1.0e-3
    weight_decay: float = 1.0e-4
    scheduler: str = "none"  # 'none' | 'cosine' | 'step' | 'warmup_cosine'
    warmup_steps: int = 0  # supported (the reference rejected this override)
    scheduler_step_size: int = 30  # StepLR(step_size=30, gamma=0.1) parity
    scheduler_gamma: float = 0.1
    max_epochs: int = 50
    early_stopping_patience: int = 10
    # Validate (and checkpoint / count early-stopping patience) every N
    # epochs — Lightning's ``check_val_every_n_epoch``.  With N > 1 and
    # the epoch-scan driver, the Trainer dispatches each N-epoch block as
    # ONE compiled program (training/steps.py:make_multi_epoch_train_step):
    # per-epoch train metrics/CSV rows are unchanged and bit-identical
    # (tested); val/ckpt/early-stop run at block boundaries.  The r3i
    # trace measured ~40% of flagship wall-time in per-epoch dispatch
    # gaps, which this removes.
    val_every_n_epochs: int = 1
    gradient_clip_norm: float = 1.0
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)


@dataclass
class EvaluationConfig:
    num_calibration_bins: int = 15
    mc_dropout_samples: int = 10


@dataclass
class OutputsConfig:
    experiments_dir: str = "./experiments"


@dataclass
class ParallelConfig:
    """SPMD layout over a ``jax.sharding.Mesh`` with axes ('data', 'model')."""

    data_parallel: int = -1  # -1 -> all remaining devices
    model_parallel: int = 1
    # Minimum size a parameter dim must have to be sharded over 'model'.
    min_shard_dim: int = 256
    # 'gspmd': one global program partitioned by XLA (supports DP x TP).
    # 'shardmap_dp': per-device step bodies via shard_map + explicit psum
    # (DP only, model_parallel must be 1) — local shapes let the Pallas
    # recurrence kernels keep running under the mesh.
    strategy: str = "gspmd"
    # Shard the TRAIN split's rows over 'data' (parallel/data.py): each
    # device holds + gathers only its own block — datasets larger than
    # one host's RAM/HBM.  shardmap_dp only (a GSPMD gather would
    # all-gather the operand).  Per-shard shuffle semantics.
    shard_data_rows: bool = False


@dataclass
class RuntimeConfig:
    platform: Optional[str] = None  # None -> jax default
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16' (params stay fp32)
    matmul_precision: str = "default"  # 'default' | 'high' | 'highest'
    deterministic: bool = True
    debug_nans: bool = False  # jit-time NaN checking (debug flag)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    donate_state: bool = True
    # Pallas in-kernel LSTM recurrence for training fwd/bwd:
    # 'auto' (on TPU when the shape qualifies) | 'off' (XLA scans)
    lstm_kernels: str = "auto"
    # Residual-stream dtype for the residual-native recurrence kernel
    # pairs (LSTM r3c/r3g, GRU twin r3l): 'float32' (exact) | 'bfloat16'
    # (halves the dominant HBM streams — the r3f trace shows both
    # recurrence kernels bandwidth-bound on them; the backward then
    # consumes bf16-rounded gates/state, a gradient approximation bounded
    # by bf16 eps per element).  Engages only on the final-hidden encoder
    # path; forward outputs stay f32.
    lstm_residual_dtype: str = "float32"
    # Gate rematerialization for the residual-native LSTM kernel pair
    # (v3, benchmarks/r3t): the forward stores only the c_prev series and
    # the backward recomputes the gate pre-activations in-kernel from the
    # streamed h_prev/x series — ~45% less kernel-pair HBM traffic at f32
    # for three extra small dots per reverse step.  MEASURED SLOWER on
    # chip (ships off; kept for re-tuning on other geometries).  On-chip
    # gradients differ from the stored-gates path at the recurrence's
    # precision-chaos scale (max rel 0.08 at T=372, r3t — same envelope
    # as any cross-formulation change); exact matmul-rounding parity
    # (~1e-7) holds only in interpret mode / CPU.
    lstm_remat_gates: bool = False
    # Checkpoint serialization: 'auto' (orbax under a multi-device mesh —
    # sharding-preserving, restore-reshard capable — msgpack otherwise) |
    # 'msgpack' | 'orbax'
    checkpoint_backend: str = "auto"
    # PRNG implementation for all jax.random streams: 'threefry2x32'
    # (default; reproducible against recorded trajectories) | 'rbg'
    # (hardware generator; +24% on the dropout-heavy transformer step,
    # benchmarks/r2x note in docs/KERNELS.md)
    prng_impl: str = "threefry2x32"
    # Drive each epoch's train steps as ONE lax.scan dispatch when the
    # split is device-resident ('auto'/'on'; 'off' = per-step dispatch).
    # Removes per-step host dispatch latency (measured 1.63x on the
    # tunneled v5e, benchmarks/r2r_tpu.json); per-step metric
    # trajectories are bit-identical to the per-step path (tested).
    epoch_scan: str = "auto"
    # Hoist the per-step batch gather out of the epoch scan: gather the
    # whole epoch's rows once up front, scan over contiguous slices.
    # Bitwise-identical trajectories; costs one epoch-sized HBM copy of
    # the split.  Measured on v5e (benchmarks/r3e_tpu.json): ~1-2%
    # SLOWER in both the flagship-f32 and b256-bf16 regimes — the
    # in-scan gathers already overlap with compute — so default off;
    # kept as a knob for gather-bound geometries (tiny models, huge B).
    epoch_pregather: bool = False


@dataclass
class Config:
    seed: int = 42
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    outputs: OutputsConfig = field(default_factory=OutputsConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)


# Fields that are open dictionaries: merge freely, no unknown-key rejection.
_OPEN_DICT_FIELDS = {("model", "encoders")}


# ---------------------------------------------------------------------------
# Merge / override machinery
# ---------------------------------------------------------------------------


def _merge_into_dataclass(obj: Any, data: Dict[str, Any], path: str = "") -> Any:
    """Recursively merge a dict into a dataclass, rejecting unknown keys."""
    if not dataclasses.is_dataclass(obj):
        raise ConfigError(f"Internal error: {path or '<root>'} is not a config node")
    names = {f.name: f for f in dataclasses.fields(obj)}
    for key, value in data.items():
        here = f"{path}.{key}" if path else key
        if key not in names:
            valid = ", ".join(sorted(names))
            raise ConfigError(
                f"Unknown config key '{here}'. Valid keys at this level: {valid}"
            )
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _merge_into_dataclass(current, value, here)
        elif _is_open_dict(here) and isinstance(value, dict):
            merged = copy.deepcopy(current) if isinstance(current, dict) else {}
            for sub_key, sub_val in value.items():
                if (
                    isinstance(sub_val, dict)
                    and isinstance(merged.get(sub_key), dict)
                ):
                    merged[sub_key] = {**merged[sub_key], **sub_val}
                else:
                    merged[sub_key] = sub_val
            setattr(obj, key, merged)
        else:
            setattr(obj, key, _coerce(value, current, here))
    return obj


def _is_open_dict(dotted: str) -> bool:
    parts = tuple(dotted.split("."))
    return any(parts[: len(open_path)] == open_path for open_path in _OPEN_DICT_FIELDS)


def _coerce(value: Any, current: Any, path: str) -> Any:
    """Light type coercion so YAML scalars land with the schema's type."""
    if value is None or current is None:
        return value
    if isinstance(current, bool):
        if isinstance(value, bool):
            return value
        raise ConfigError(f"Config key '{path}' expects a bool, got {value!r}")
    if isinstance(current, str) and isinstance(value, bool):
        # YAML 1.1 parses on/off (and yes/no/true/false) as bools before
        # we see the raw token; for string-typed switches such as
        # runtime.epoch_scan='auto'|'on'|'off' map them back.
        return "on" if value else "off"
    if isinstance(current, int) and not isinstance(current, bool):
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value.is_integer():
            return int(value)
        raise ConfigError(f"Config key '{path}' expects an int, got {value!r}")
    if isinstance(current, float):
        if isinstance(value, (int, float)):
            return float(value)
        if isinstance(value, str):
            # YAML 1.1 reads '5e-4' as a string; Hydra treats it as a float
            try:
                return float(value)
            except ValueError:
                pass
        raise ConfigError(f"Config key '{path}' expects a float, got {value!r}")
    return value


def _set_dotted(config: Config, dotted_key: str, value: Any) -> None:
    parts = dotted_key.split(".")
    nested: Dict[str, Any] = {}
    cursor = nested
    for part in parts[:-1]:
        cursor[part] = {}
        cursor = cursor[part]
    cursor[parts[-1]] = value
    _merge_into_dataclass(config, nested)


def apply_overrides(config: Config, overrides: List[str]) -> Config:
    """Apply ``key.path=value`` overrides (values parsed as YAML scalars)."""
    for item in overrides:
        if "=" not in item:
            raise ConfigError(
                f"Override '{item}' is not of the form key.path=value"
            )
        key, _, raw = item.partition("=")
        key = key.strip()
        if not key:
            raise ConfigError(f"Override '{item}' has an empty key")
        try:
            value = yaml.safe_load(raw)
        except yaml.YAMLError as exc:
            raise ConfigError(f"Could not parse value in override '{item}': {exc}")
        _set_dotted(config, key, value)
    return config


def load_config(
    path: Optional[str] = None,
    overrides: Optional[List[str]] = None,
) -> Config:
    """Load YAML config (defaults if ``path`` is None) then apply overrides."""
    config = Config()
    if path is not None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        if not isinstance(data, dict):
            raise ConfigError(f"Config file {path} must contain a mapping")
        _merge_into_dataclass(config, data)
    if overrides:
        apply_overrides(config, overrides)
    return config


# ---------------------------------------------------------------------------
# Serialization / snapshot
# ---------------------------------------------------------------------------


def config_to_dict(config: Any) -> Dict[str, Any]:
    return dataclasses.asdict(config)


def config_to_yaml(config: Config) -> str:
    return yaml.safe_dump(config_to_dict(config), sort_keys=False)


def snapshot_config(
    config: Config, run_dir: Path, overrides: Optional[List[str]] = None
) -> Path:
    """Write the resolved config (+ overrides) under ``run_dir`` — the
    equivalent of Hydra's per-run ``.hydra/{config,overrides}.yaml`` snapshot
    (e.g. /root/reference/outputs/2025-12-01/18-35-21/.hydra/)."""
    snap_dir = Path(run_dir) / "config_snapshot"
    snap_dir.mkdir(parents=True, exist_ok=True)
    (snap_dir / "config.yaml").write_text(config_to_yaml(config))
    (snap_dir / "overrides.yaml").write_text(
        yaml.safe_dump(list(overrides or []), sort_keys=False)
    )
    return snap_dir


def save_config_json(config: Config, path: Path) -> None:
    Path(path).write_text(json.dumps(config_to_dict(config), indent=2))
