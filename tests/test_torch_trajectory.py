"""Training-dynamics parity vs the ACTUAL reference model code.

The strongest parity evidence obtainable in this environment (no RAVDESS
media ships in the image): import the reference's own encoder module from
/root/reference/src, wire its flagship model exactly as the reference's
LightningModule does (concat head, /root/reference/src/train.py:79-85,
153-160; AdamW + grad-norm clip, train.py:238-242,540 with
configs/base.yaml gradient_clip_norm=1.0), copy its initial weights into
this framework via utils/torch_import, then train BOTH frameworks for 50
steps on identical synthetic batches and assert per-step loss closeness.

Everything that matters to training dynamics is exercised end to end:
forward numerics (LSTM gate order, attention pooling, LayerNorm eps), the
cross-entropy loss, global-norm clipping, AdamW bias correction and
decoupled weight decay, and 50 steps of compounding parameter drift.

The reference code is *imported*, never copied; the tiny container class
below is test scaffolding mirroring the ModuleDict wiring of
train.py:50-85 so state_dict keys line up with the import mapping.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_emotion_detection_tpu.config import TrainingConfig  # noqa: E402
from multimodal_emotion_detection_tpu.models.classifier import (  # noqa: E402
    MultimodalClassifier,
)
from multimodal_emotion_detection_tpu.training.optim import (  # noqa: E402
    build_optimizer,
)
from multimodal_emotion_detection_tpu.training.steps import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from multimodal_emotion_detection_tpu.utils.torch_import import (  # noqa: E402
    import_reference_state_dict,
)

# Geometry: small for CPU speed, but the full flagship topology.
A_DIM, V_DIM = 12, 16
T_AUDIO, T_VIDEO = 20, 10
OUT_DIM, ENC_HIDDEN, HEAD_HIDDEN = 32, 24, 48
NUM_CLASSES = 8
BATCH, STEPS = 16, 50
LR, WD, CLIP = 1e-3, 1e-2, 1.0


def _import_reference_encoders():
    """Import /root/reference/src/encoders.py with torchvision stubbed.

    The reference imports torchvision at module top (encoders.py:13) only
    for its optional PretrainedCNNEncoder; torchvision isn't installed
    here, and the flagship model never touches it, so a bare module stub
    keeps the *actual reference code* importable for comparison.
    """
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    import encoders as ref_encoders  # the reference's own module

    return ref_encoders


def _build_reference_model(ref_encoders, encoder_type="lstm"):
    """Mirror MultimodalFusionModule's wiring (ref train.py:50-85)."""

    class RefFlagship(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoders = torch.nn.ModuleDict(
                {
                    "audio": ref_encoders.build_encoder(
                        modality="audio",
                        input_dim=A_DIM,
                        output_dim=OUT_DIM,
                        encoder_config={
                            "hidden_dim": ENC_HIDDEN,
                            "dropout": 0.0,
                            "num_layers": 2,
                            "encoder_type": encoder_type,
                        },
                    ),
                    "video": ref_encoders.build_encoder(
                        modality="video",
                        input_dim=V_DIM,
                        output_dim=OUT_DIM,
                        encoder_config={
                            "hidden_dim": ENC_HIDDEN,
                            "dropout": 0.0,
                        },
                    ),
                }
            )
            # ref train.py:81-85
            self.fusion_head = torch.nn.Sequential(
                torch.nn.Linear(2 * OUT_DIM, HEAD_HIDDEN),
                torch.nn.ReLU(),
                torch.nn.Linear(HEAD_HIDDEN, NUM_CLASSES),
            )

        def forward(self, features):
            encoded = [
                self.encoders[m](features[m]) for m in ("audio", "video")
            ]
            return self.fusion_head(torch.cat(encoded, dim=-1))

    torch.manual_seed(7)
    return RefFlagship()


def _build_our_model(encoder_type="lstm"):
    return MultimodalClassifier(
        modalities=("audio", "video"),
        encoder_configs={
            "audio": {
                "type": "sequence",
                "encoder_type": encoder_type,
                "input_dim": A_DIM,
                "hidden_dim": ENC_HIDDEN,
                "num_layers": 2,
                "dropout": 0.0,
            },
            "video": {
                "type": "frame",
                "input_dim": V_DIM,
                "hidden_dim": ENC_HIDDEN,
                "dropout": 0.0,
            },
        },
        num_classes=NUM_CLASSES,
        output_dim=OUT_DIM,
        hidden_dim=HEAD_HIDDEN,
        dropout=0.0,
        train_fusion="concat",
        use_modality_mask=False,
    )


def _synthetic_batches():
    rng = np.random.RandomState(123)
    audio = rng.randn(STEPS, BATCH, T_AUDIO, A_DIM).astype(np.float32)
    video = rng.randn(STEPS, BATCH, T_VIDEO, V_DIM).astype(np.float32)
    labels = rng.randint(0, NUM_CLASSES, size=(STEPS, BATCH)).astype(np.int64)
    return audio, video, labels


def _torch_trajectory(model, audio, video, labels, scheduler=None,
                      steps_per_epoch=10):
    """scheduler: None | 'cosine' | 'step' — stepped once per 'epoch'
    (every steps_per_epoch optimizer steps), mirroring Lightning's
    interval='epoch' wiring (ref train.py:253-278)."""
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    sched = None
    if scheduler == "cosine":
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=STEPS // steps_per_epoch, eta_min=LR / 100)
    elif scheduler == "step":
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.1)
    criterion = torch.nn.CrossEntropyLoss()
    model.train()
    losses = []
    for s in range(STEPS):
        feats = {
            "audio": torch.from_numpy(audio[s]),
            "video": torch.from_numpy(video[s]),
        }
        logits = model(feats)
        loss = criterion(logits, torch.from_numpy(labels[s]))
        opt.zero_grad()
        loss.backward()
        # Lightning applies gradient_clip_val as a global-norm clip before
        # the optimizer step (ref train.py:540, configs/base.yaml:55)
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        if sched is not None and (s + 1) % steps_per_epoch == 0:
            sched.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses)


def _ours_trajectory(init_state_dict, audio, video, labels,
                     encoder_type="lstm", scheduler="none",
                     steps_per_epoch=10):
    model = _build_our_model(encoder_type)
    cfg = TrainingConfig(
        optimizer="adamw",
        learning_rate=LR,
        weight_decay=WD,
        scheduler=scheduler,
        max_epochs=STEPS // steps_per_epoch,
        scheduler_step_size=2,
        gradient_clip_norm=CLIP,
    )
    tx, _ = build_optimizer(
        cfg, steps_per_epoch=steps_per_epoch if scheduler != "none" else STEPS
    )
    sample = {
        "audio": jnp.asarray(audio[0]),
        "video": jnp.asarray(video[0]),
    }
    mask = jnp.ones((BATCH, 2), jnp.float32)
    state = create_train_state(model, tx, sample, mask, jax.random.PRNGKey(0))
    params = import_reference_state_dict(init_state_dict, state.params)
    state = state.replace(params=jax.tree.map(jnp.asarray, params))

    step = make_train_step(model, tx, num_modalities=2, modality_dropout=0.0,
                           has_batch_stats=bool(state.model_state),
                           donate=False)
    valid = jnp.ones((BATCH,), jnp.float32)
    key = jax.random.PRNGKey(0)
    losses = []
    for s in range(STEPS):
        feats = {
            "audio": jnp.asarray(audio[s]),
            "video": jnp.asarray(video[s]),
        }
        lab = jnp.asarray(labels[s].astype(np.int32))
        idx = jnp.arange(BATCH, dtype=jnp.int32)
        state, metrics = step(state, feats, lab, idx, valid, key)
        losses.append(float(metrics["loss"]))
    return np.asarray(losses)


import pytest as _pytest


@_pytest.mark.parametrize("scheduler", ["cosine", "step"])
def test_training_trajectory_matches_torch_with_scheduler(scheduler):
    """Same 50-step parity with the reference's per-epoch LR schedulers
    active (CosineAnnealingLR T_max=max_epochs eta_min=lr/100; StepLR
    gamma=0.1 — ref train.py:253-278), 'epoch' = 10 steps here."""
    ref_encoders = _import_reference_encoders()
    torch_model = _build_reference_model(ref_encoders, "lstm")
    audio, video, labels = _synthetic_batches()

    import copy

    init_sd = copy.deepcopy(torch_model.state_dict())
    torch_losses = _torch_trajectory(torch_model, audio, video, labels,
                                     scheduler=scheduler)
    our_losses = _ours_trajectory(init_sd, audio, video, labels,
                                  scheduler=scheduler)
    rel = np.abs(our_losses - torch_losses) / np.abs(torch_losses)
    assert rel[0] < 1e-6, f"initial forward diverges: rel {rel[0]:.2e}"
    assert rel.max() < 2e-3, (
        f"trajectory diverged under {scheduler}: max rel {rel.max():.2e} "
        f"at step {int(rel.argmax())}"
    )


@_pytest.mark.parametrize(
    "encoder_type", ["lstm", "gru", "cnn", "transformer"]
)
def test_training_trajectory_matches_torch(encoder_type):
    ref_encoders = _import_reference_encoders()
    torch_model = _build_reference_model(ref_encoders, encoder_type)
    audio, video, labels = _synthetic_batches()

    # snapshot BEFORE torch trains (opt.step() mutates the model in place)
    import copy

    init_sd = copy.deepcopy(torch_model.state_dict())
    torch_losses = _torch_trajectory(torch_model, audio, video, labels)
    our_losses = _ours_trajectory(init_sd, audio, video, labels,
                                  encoder_type)

    # Per-step relative closeness: forward numerics, CE, clipping, and
    # AdamW must all line up for the compounding drift to stay this small
    # in fp32.  Measured profile: step 0 agrees to ~1e-7 (pure forward
    # parity), drift compounds through the optimizer to ~1e-3 by step 50 —
    # ordinary fp32 accumulation between two *correct* implementations
    # (different reduction orders), not an algorithmic gap, so the bound is
    # tight early and drift-bounded late.
    rel = np.abs(our_losses - torch_losses) / np.abs(torch_losses)
    assert rel[0] < 1e-6, f"initial forward diverges: rel {rel[0]:.2e}"
    assert rel[:25].max() < 8e-4, (
        f"early trajectory diverged: max rel {rel[:25].max():.2e} at step "
        f"{int(rel[:25].argmax())}"
    )
    assert rel.max() < 2e-3, (
        f"trajectory diverged: max rel diff {rel.max():.2e} at step "
        f"{int(rel.argmax())}\n torch={torch_losses[rel.argmax()]}"
        f" ours={our_losses[rel.argmax()]}"
    )
    # and training actually moved (not a frozen-model vacuous pass): the
    # losses change step to step by more than noise
    assert np.ptp(torch_losses) > 1e-2
    assert np.abs(np.diff(torch_losses)).max() > 1e-3
