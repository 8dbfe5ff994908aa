"""TPU-native multimodal emotion detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``parshva-mehta/multimodal-emotion-detection`` (RAVDESS audio+video 8-class
emotion classification): ETL, multimodal data loading with modality dropout,
per-modality encoders (LSTM/GRU/CNN/Transformer/frame/MLP), cross-modal
attention, early/late/hybrid/uncertainty fusion, a jit-compiled training
engine with checkpointing + early stopping, MC-dropout/calibration tooling,
and SPMD data/model parallelism over a TPU mesh.

Nothing here is a port: the compute path is functional JAX (flax.linen
modules applied as pure functions over parameter pytrees), hot kernels are
Pallas, recurrences are ``lax.scan`` with pre-computed input projections so
the MXU sees large batched matmuls, and scaling is ``jax.sharding`` over a
``Mesh`` rather than any torch.distributed analogue (the reference has none;
see /root/reference/src/train.py:535-536 single-device).
"""

__version__ = "0.1.0"

from multimodal_emotion_detection_tpu.config import (  # noqa: F401
    Config,
    load_config,
    apply_overrides,
    config_to_dict,
)
