"""The end-to-end multimodal classifier: frontend -> encoders -> fusion.

This is the jit'd "single XLA graph" of BASELINE.json's north star: audio
frontend (optional fused Pallas log-mel), per-modality encoders, fusion,
and the classification head compile as one function of
``(params, features, mask, rng)``.

Faithful to the reference LightningModule's semantics
(/root/reference/src/train.py:34-164) including its two documented quirks,
both config-switchable:

* ``train_fusion='concat'`` (default) reproduces the *active* reference
  path: concat encoder outputs in config modality order -> Dense(hidden) ->
  ReLU -> Dense(C) (ref train.py:81-85,149-164), bypassing the fusion
  library.  ``'library'`` routes through ``build_fusion_model`` instead
  (the commented-out intent at ref train.py:68-76).
* ``use_modality_mask=False`` (default) ignores the availability mask like
  the reference forward does (ref train.py:121-164 never reads ``mask``),
  preserving the bitwise-reproducibility invariant of SURVEY.md §6;
  ``True`` zero-masks features and feeds the mask to fusion.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodal_emotion_detection_tpu.models.encoders import build_encoder
from multimodal_emotion_detection_tpu.models.fusion import build_fusion_model
from multimodal_emotion_detection_tpu.ops.logmel import (
    LogMelParams,
    log_mel_spectrogram,
    mfcc,
)
from multimodal_emotion_detection_tpu.ops.resize import (
    area_resize,
    bgr_to_gray,
)


class MultimodalClassifier(nn.Module):
    modalities: Tuple[str, ...]
    encoder_configs: Dict[str, Dict[str, Any]]
    num_classes: int = 8
    output_dim: int = 128
    hidden_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.3
    fusion_type: str = "early"
    train_fusion: str = "concat"  # 'concat' | 'library'
    use_modality_mask: bool = False
    audio_frontend: Optional[LogMelParams] = None  # None -> raw waveform
    frontend_kind: str = "logmel"  # 'logmel' | 'mfcc' (when frontend set)
    frontend_n_mfcc: int = 40
    frontend_use_pallas: bool = True
    frontend_interpret: bool = False  # Pallas interpret mode (CPU dryruns)
    # on-device video transform (BASELINE.json north star: "batched
    # image-transform kernels feeding HBM-resident tensors")
    video_frontend: str = "none"  # 'none' | 'resize'
    video_hw: Tuple[int, int] = (64, 64)
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        encoders = {}
        for modality in self.modalities:
            cfg = dict(self.encoder_configs.get(modality, {}))
            if modality == "audio" and self.audio_frontend is not None:
                # frontend output width overrides the encoder input dim
                cfg["input_dim"] = (
                    self.frontend_n_mfcc
                    if self.frontend_kind == "mfcc"
                    else self.audio_frontend.n_mels
                )
            encoders[modality] = build_encoder(
                modality=modality,
                input_dim=cfg.get("input_dim", 64),
                output_dim=self.output_dim,
                encoder_config=cfg,
                dtype=self.dtype,
            )
        self.encoders = encoders

        if self.train_fusion == "library":
            self.fusion = build_fusion_model(
                fusion_type=self.fusion_type,
                modality_dims={m: self.output_dim for m in self.modalities},
                num_classes=self.num_classes,
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                dtype=self.dtype,
            )
        else:
            self.head_in = nn.Dense(self.hidden_dim, dtype=self.dtype)
            self.head_out = nn.Dense(self.num_classes, dtype=self.dtype)

    def _apply_frontend(
        self, modality: str, features: jnp.ndarray
    ) -> jnp.ndarray:
        if modality == "audio" and self.audio_frontend is not None:
            if self.frontend_kind == "mfcc":
                return mfcc(
                    features,
                    self.audio_frontend,
                    n_mfcc=self.frontend_n_mfcc,
                    use_pallas=self.frontend_use_pallas,
                    interpret=self.frontend_interpret,
                )
            return log_mel_spectrogram(
                features,
                self.audio_frontend,
                use_pallas=self.frontend_use_pallas,
                interpret=self.frontend_interpret,
            )
        if (
            modality == "video"
            and self.video_frontend == "resize"
            and features.ndim >= 4
        ):
            # (B, T, H, W[, 3]) raw frames -> gray -> area-resize -> [0,1]
            # -> (B, T, h*w); transforms run as MXU matmuls (ops/resize.py)
            x = features
            if x.ndim == 5 and x.shape[-1] == 3:
                x = bgr_to_gray(x)
            h, w = self.video_hw
            x = area_resize(x, h, w) / 255.0
            return x.reshape(x.shape[0], x.shape[1], h * w)
        return features

    def encode(
        self,
        features: Dict[str, jnp.ndarray],
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        bn_eval: Optional[bool] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Per-modality embeddings (B, output_dim)."""
        encoded = {}
        for i, modality in enumerate(self.modalities):
            if modality not in features:
                continue
            x = self._apply_frontend(modality, features[modality])
            if self.use_modality_mask and mask is not None:
                m = mask[:, i].reshape((-1,) + (1,) * (x.ndim - 1))
                x = x * m.astype(x.dtype)
            # per-encoder dtype overrides (mixed precision) are confined
            # to the encoder: outputs rejoin the model dtype here
            encoded[modality] = self.encoders[modality](
                x, deterministic=deterministic, bn_eval=bn_eval
            ).astype(self.dtype)
        return encoded

    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_aux: bool = False,
        bn_eval: Optional[bool] = None,
    ):
        encoded = self.encode(features, mask, deterministic, bn_eval=bn_eval)

        if self.train_fusion == "library":
            if self.use_modality_mask and mask is not None:
                fusion_mask = mask
            else:
                # mask-ignoring mode: fusions treat all modalities as
                # available (LateFusionWithUncertainty *requires* a mask,
                # so all-ones rather than None)
                b = next(iter(encoded.values())).shape[0]
                fusion_mask = jnp.ones(
                    (b, len(self.modalities)), dtype=jnp.float32
                )
            output = self.fusion(
                encoded, fusion_mask, deterministic=deterministic
            )
            aux: Dict[str, Any] = {}
            if isinstance(output, tuple):
                logits, fusion_aux = output[0], output[1]
                aux = (
                    fusion_aux
                    if isinstance(fusion_aux, dict)
                    else {"per_modality_logits": fusion_aux}
                )
            else:
                logits = output
        else:
            ordered = [
                encoded[m] for m in self.modalities if m in encoded
            ]
            if not ordered:
                raise ValueError("No modalities were encoded")
            fused = jnp.concatenate(ordered, axis=-1)
            h = nn.relu(self.head_in(fused))
            logits = self.head_out(h)
            aux = {}

        if return_aux:
            aux["encoded"] = encoded
            return logits, aux
        return logits


def load_pretrained_encoder_weights(params, model_state, encoder_configs):
    """Graft locally-saved torchvision ResNet state_dicts into initialized
    encoder parameters.

    Config knob ``model.encoders.<modality>.weights_path`` on a
    ``pretrained_cnn`` encoder — the zero-egress equivalent of the
    reference's ``pretrained=True`` torchvision download
    (/root/reference/src/encoders.py:400-529, download at :424-438).  The
    user points ``weights_path`` at a local torchvision-layout ``.pth``
    state_dict; conversion (OIHW->HWIO transpose, BN params + running
    stats) is models/resnet.py::load_torch_resnet_weights.

    Returns ``(params, model_state)`` with the ``<modality>_encoder ->
    backbone`` subtree replaced; tree *structure* is unchanged, so an
    optimizer state already initialized from ``params`` stays valid.
    """
    from multimodal_emotion_detection_tpu.models.resnet import (
        load_torch_resnet_weights,
    )

    new_params = dict(params)
    new_state = {k: dict(v) for k, v in dict(model_state or {}).items()}
    for modality, cfg in dict(encoder_configs or {}).items():
        cfg = dict(cfg)
        path = cfg.get("weights_path")
        if not path:
            continue
        if cfg.get("type") != "pretrained_cnn":
            raise ValueError(
                f"model.encoders.{modality}.weights_path requires "
                f"type='pretrained_cnn', got {cfg.get('type')!r}"
            )
        enc = f"{modality}_encoder"
        if enc not in new_params or "backbone" not in new_params[enc]:
            raise ValueError(
                f"No initialized backbone for modality '{modality}' "
                f"(expected params['{enc}']['backbone'])"
            )
        sub = {"params": new_params[enc]["backbone"]}
        bstats = (
            new_state.get("batch_stats", {}).get(enc, {}).get("backbone")
        )
        if bstats is not None:
            sub["batch_stats"] = bstats
        loaded = load_torch_resnet_weights(
            sub, path, variant=cfg.get("backbone", "resnet18")
        )
        new_params[enc] = dict(new_params[enc])
        new_params[enc]["backbone"] = loaded["params"]
        if bstats is not None:
            bs = dict(new_state["batch_stats"])
            bs[enc] = dict(bs[enc])
            bs[enc]["backbone"] = loaded["batch_stats"]
            new_state["batch_stats"] = bs
    return new_params, new_state


def logmel_params_from_config(fe) -> LogMelParams:
    """FrontendConfig -> LogMelParams (shared by model + feature cache)."""
    return LogMelParams(
        sample_rate=fe.sample_rate,
        n_fft=fe.n_fft,
        hop_length=fe.hop_length,
        win_length=fe.win_length,
        n_mels=fe.n_mels,
        fmin=fe.fmin,
        fmax=fe.fmax,
        log_epsilon=fe.log_epsilon,
    )


def classifier_from_config(config) -> MultimodalClassifier:
    """Build the flagship model from a ``Config`` (see config.py)."""
    fe = config.model.frontend
    frontend = None
    encoder_overrides = {}
    if fe.audio in ("logmel", "mfcc"):
        if getattr(fe, "cache", False):
            # features are precomputed per split (training/loop.py); the
            # model consumes them directly — same numerics, no in-graph
            # frontend, and an identical (frontend-parameter-free) tree
            width = fe.n_mfcc if fe.audio == "mfcc" else fe.n_mels
            encoder_overrides = {"audio": {"input_dim": width}}
        else:
            frontend = logmel_params_from_config(fe)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        config.runtime.compute_dtype
    ]
    encoder_configs = {
        name: dict(cfg) for name, cfg in dict(config.model.encoders).items()
    }
    for name, over in encoder_overrides.items():
        encoder_configs.setdefault(name, {}).update(over)
    return MultimodalClassifier(
        modalities=tuple(config.dataset.modalities),
        encoder_configs=encoder_configs,
        num_classes=config.dataset.num_classes,
        output_dim=config.model.output_dim,
        hidden_dim=config.model.hidden_dim,
        num_heads=config.model.num_heads,
        dropout=config.model.dropout,
        fusion_type=config.model.fusion_type,
        train_fusion=config.model.train_fusion,
        use_modality_mask=config.model.use_modality_mask,
        audio_frontend=frontend,
        frontend_kind=fe.audio if fe.audio != "raw" else "logmel",
        frontend_n_mfcc=fe.n_mfcc,
        frontend_use_pallas=fe.use_pallas,
        video_frontend=fe.video,
        video_hw=(fe.video_height, fe.video_width),
        dtype=dtype,
    )
