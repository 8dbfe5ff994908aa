"""Convergence-level outcome parity vs the reference's own torch code.

Extends the 50-step trajectory parity (test_torch_trajectory.py) to
*outcomes*: both frameworks train to early-stop on identical learnable
synthetic data and must agree on best-val-loss and test-accuracy; plus a
trajectory run at the reference's big-config geometry (LSTM x3, out 256 /
hidden 512 — the model behind every BASELINE.md number, run.slurm:99-123),
CPU-feasible T.

The reference encoder code is imported from /root/reference/src (never
copied); its training semantics (AdamW + global-norm clip 1.0 + val-loss
early stopping + best-checkpoint test, train.py:458-649) are mirrored in
the compact torch loop below.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_emotion_detection_tpu.config import (  # noqa: E402
    Config,
    TrainingConfig,
)
from multimodal_emotion_detection_tpu.data.dataset import (  # noqa: E402
    MultimodalArrays,
)
from multimodal_emotion_detection_tpu.data.loader import (  # noqa: E402
    MultimodalLoader,
)
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
from tests.test_torch_trajectory import (  # noqa: E402
    _import_reference_encoders,
)

# ---------------------------------------------------------------------------
# Learnable synthetic data (the reference's synthetic set is pure noise,
# data.py:125-188, so nothing converges on it; class-conditional means make
# convergence — and therefore outcome parity — observable)
# ---------------------------------------------------------------------------

A_DIM, V_DIM = 12, 16
T_AUDIO, T_VIDEO = 20, 10
NUM_CLASSES = 8


def _learnable_splits(seed=0, n_train=256, n_eval=64, shift=1.2):
    rng = np.random.RandomState(seed)
    means_a = rng.randn(NUM_CLASSES, A_DIM) * shift
    means_v = rng.randn(NUM_CLASSES, V_DIM) * shift

    def make(n, salt):
        r = np.random.RandomState(seed * 1000 + salt)
        labels = r.randint(0, NUM_CLASSES, size=n)
        audio = (r.randn(n, T_AUDIO, A_DIM)
                 + means_a[labels][:, None, :]).astype(np.float32)
        video = (r.randn(n, T_VIDEO, V_DIM)
                 + means_v[labels][:, None, :]).astype(np.float32)
        return audio, video, labels.astype(np.int64)

    return make(n_train, 1), make(n_eval, 2), make(n_eval, 3)


def _build_torch_flagship(ref_encoders, *, enc_hidden, out_dim, head_hidden,
                          num_layers, seed=7):
    class RefFlagship(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoders = torch.nn.ModuleDict({
                "audio": ref_encoders.build_encoder(
                    modality="audio", input_dim=A_DIM, output_dim=out_dim,
                    encoder_config={"hidden_dim": enc_hidden, "dropout": 0.0,
                                    "num_layers": num_layers,
                                    "encoder_type": "lstm"},
                ),
                "video": ref_encoders.build_encoder(
                    modality="video", input_dim=V_DIM, output_dim=out_dim,
                    encoder_config={"hidden_dim": enc_hidden, "dropout": 0.0},
                ),
            })
            self.fusion_head = torch.nn.Sequential(
                torch.nn.Linear(2 * out_dim, head_hidden),
                torch.nn.ReLU(),
                torch.nn.Linear(head_hidden, NUM_CLASSES),
            )

        def forward(self, features):
            encoded = [self.encoders[m](features[m])
                       for m in ("audio", "video")]
            return self.fusion_head(torch.cat(encoded, dim=-1))

    torch.manual_seed(seed)
    return RefFlagship()


def _build_our_flagship(*, enc_hidden, out_dim, head_hidden, num_layers):
    return MultimodalClassifier(
        modalities=("audio", "video"),
        encoder_configs={
            "audio": {"type": "sequence", "encoder_type": "lstm",
                      "input_dim": A_DIM, "hidden_dim": enc_hidden,
                      "num_layers": num_layers, "dropout": 0.0},
            "video": {"type": "frame", "input_dim": V_DIM,
                      "hidden_dim": enc_hidden, "dropout": 0.0},
        },
        num_classes=NUM_CLASSES, output_dim=out_dim, hidden_dim=head_hidden,
        dropout=0.0, train_fusion="concat", use_modality_mask=False,
    )


# ---------------------------------------------------------------------------
# 1) Big-config geometry trajectory (LSTM x3, out 256 / hidden 512)
# ---------------------------------------------------------------------------


def test_big_config_trajectory_matches_torch():
    """Per-step loss parity at the reference's big sweep geometry
    (run.slurm:99-123: encoder hidden 512, LSTM x3, output_dim 256, head
    hidden 512) — the exact model behind the BASELINE.md numbers — for 30
    steps on CPU-feasible sequence lengths."""
    GEO = dict(enc_hidden=512, out_dim=256, head_hidden=512, num_layers=3)
    BATCH, STEPS, LR, WD, CLIP = 8, 30, 1e-3, 1e-2, 1.0

    ref_encoders = _import_reference_encoders()
    tm = _build_torch_flagship(ref_encoders, **GEO)
    init_sd = copy.deepcopy(tm.state_dict())

    rng = np.random.RandomState(42)
    audio = rng.randn(STEPS, BATCH, T_AUDIO, A_DIM).astype(np.float32)
    video = rng.randn(STEPS, BATCH, T_VIDEO, V_DIM).astype(np.float32)
    labels = rng.randint(0, NUM_CLASSES, (STEPS, BATCH)).astype(np.int64)

    opt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)
    crit = torch.nn.CrossEntropyLoss()
    tm.train()
    torch_losses = []
    for s in range(STEPS):
        logits = tm({"audio": torch.from_numpy(audio[s]),
                     "video": torch.from_numpy(video[s])})
        loss = crit(logits, torch.from_numpy(labels[s]))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        opt.step()
        torch_losses.append(float(loss.detach()))
    torch_losses = np.asarray(torch_losses)

    model = _build_our_flagship(**GEO)
    cfg = TrainingConfig(optimizer="adamw", learning_rate=LR,
                         weight_decay=WD, scheduler="none",
                         gradient_clip_norm=CLIP)
    tx, _ = build_optimizer(cfg, steps_per_epoch=STEPS)
    sample = {"audio": jnp.asarray(audio[0]), "video": jnp.asarray(video[0])}
    state = create_train_state(model, tx, sample,
                               jnp.ones((BATCH, 2), jnp.float32),
                               jax.random.PRNGKey(0))
    params = import_reference_state_dict(init_sd, state.params)
    state = state.replace(params=jax.tree.map(jnp.asarray, params))
    step = make_train_step(model, tx, num_modalities=2, modality_dropout=0.0,
                           has_batch_stats=bool(state.model_state),
                           donate=False)
    valid = jnp.ones((BATCH,), jnp.float32)
    key = jax.random.PRNGKey(0)
    idx = jnp.arange(BATCH, dtype=jnp.int32)
    our_losses = []
    for s in range(STEPS):
        state, metrics = step(
            state,
            {"audio": jnp.asarray(audio[s]), "video": jnp.asarray(video[s])},
            jnp.asarray(labels[s].astype(np.int32)), idx, valid, key)
        our_losses.append(float(metrics["loss"]))
    our_losses = np.asarray(our_losses)

    rel = np.abs(our_losses - torch_losses) / np.abs(torch_losses)
    # Measured envelope (2026-08-17): step 0 is EXACT (weights imported,
    # forward parity), step 1 differs by 3.4e-5 — reduction-order noise on
    # the 512x2048 gate matmuls (torch/oneDNN vs XLA tile orders), injected
    # afresh every step.  The big geometry is measurably chaotic: a 1e-6
    # *absolute* init perturbation of the SAME torch code against itself
    # drifts to 8.3e-4 by step 29 (~30x amplification); per-step 3e-5
    # injections compounding at that rate land at ~1e-2 by step 30 — which
    # is what we observe (1.7e-2).  So: strict bound in the pre-chaos
    # window (update math must be right), chaos-envelope bound late.
    assert rel[0] < 1e-6, f"initial forward diverges: rel {rel[0]:.2e}"
    assert rel[:3].max() < 2e-4, (
        f"early big-config trajectory diverged: max rel "
        f"{rel[:3].max():.2e} — update math mismatch, not fp chaos"
    )
    assert rel.max() < 3e-2, (
        f"big-config trajectory diverged beyond the measured chaos "
        f"envelope: max rel {rel.max():.2e} at step {int(rel.argmax())}"
    )
    assert np.ptp(torch_losses) > 1e-2  # training moved


# ---------------------------------------------------------------------------
# 2) Early-stop outcome parity on learnable data
# ---------------------------------------------------------------------------


def _torch_train_to_early_stop(tm, splits, *, lr=1e-3, wd=1e-2, clip=1.0,
                               batch=16, max_epochs=30, patience=5,
                               seed=11):
    (tr_a, tr_v, tr_y), (va_a, va_v, va_y), (te_a, te_v, te_y) = splits
    opt = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=wd)
    crit = torch.nn.CrossEntropyLoss()
    rng = np.random.RandomState(seed)
    best_val, best_sd, wait = np.inf, None, 0

    def eval_on(a, v, y):
        tm.eval()
        with torch.no_grad():
            logits = tm({"audio": torch.from_numpy(a),
                         "video": torch.from_numpy(v)})
            loss = crit(logits, torch.from_numpy(y))
            acc = (logits.argmax(-1).numpy() == y).mean()
        return float(loss), float(acc)

    n = len(tr_y)
    for _ in range(max_epochs):
        tm.train()
        order = rng.permutation(n)
        for i in range(0, n - batch + 1, batch):
            sel = order[i:i + batch]
            logits = tm({"audio": torch.from_numpy(tr_a[sel]),
                         "video": torch.from_numpy(tr_v[sel])})
            loss = crit(logits, torch.from_numpy(tr_y[sel]))
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), clip)
            opt.step()
        val_loss, _ = eval_on(va_a, va_v, va_y)
        if val_loss < best_val:
            best_val, wait = val_loss, 0
            best_sd = copy.deepcopy(tm.state_dict())
        else:
            wait += 1
            if wait >= patience:
                break
    tm.load_state_dict(best_sd)
    _, test_acc = eval_on(te_a, te_v, te_y)
    return best_val, test_acc


def test_convergence_outcomes_match_torch(tmp_path):
    """Both frameworks train their flagship to early-stop on the SAME
    learnable synthetic dataset (same arrays; each framework uses its own
    shuffling) and must converge to the same place: best-val-loss and
    best-checkpoint test-accuracy agree within stated tolerances, and both
    actually learn (test acc far above the 0.125 chance floor).

    Measured (2026-08-17, CPU): torch best_val 0.0006 / test_acc 1.0000;
    ours best_val 0.0004 / test_acc 1.0000 (deltas 2e-4 / 0.0).  PARITY.md
    quotes these.
    """
    GEO = dict(enc_hidden=24, out_dim=32, head_hidden=48, num_layers=2)
    splits = _learnable_splits()

    ref_encoders = _import_reference_encoders()
    tm = _build_torch_flagship(ref_encoders, **GEO)
    t_val, t_acc = _torch_train_to_early_stop(tm, splits)

    # ---- ours: the full Trainer engine (early stop, top-k, best ckpt) ----
    from multimodal_emotion_detection_tpu.training.loop import Trainer

    (tr_a, tr_v, tr_y), (va_a, va_v, va_y), (te_a, te_v, te_y) = splits

    def loader(a, v, y, shuffle):
        return MultimodalLoader(
            MultimodalArrays(features={"audio": a, "video": v},
                             labels=y.astype(np.int32),
                             modalities=["audio", "video"]),
            batch_size=16, shuffle=shuffle, drop_last=shuffle, seed=11,
        )

    cfg = Config()
    cfg.dataset.modalities = ["audio", "video"]
    cfg.dataset.num_classes = NUM_CLASSES
    cfg.dataset.batch_size = 16
    cfg.training.max_epochs = 30
    cfg.training.early_stopping_patience = 5
    cfg.training.learning_rate = 1e-3
    cfg.training.weight_decay = 1e-2
    cfg.training.augmentation.modality_dropout = 0.0
    model = _build_our_flagship(**GEO)
    trainer = Trainer(cfg, model=model, save_dir=tmp_path / "run")
    trainer.fit(loader(tr_a, tr_v, tr_y, True), loader(va_a, va_v, va_y, False))
    o_val = trainer.checkpoints.best_model_score
    metrics, _, _, _ = trainer.test(loader(te_a, te_v, te_y, False),
                                    state=trainer.load_best())
    o_acc = metrics["test/acc"]

    # both frameworks learned the task...
    assert t_acc > 0.85 and o_acc > 0.85, (t_acc, o_acc)
    # ...and converged to the same outcome (different init draws + shuffle
    # orders; the tolerance is the honest convergence-level band)
    assert abs(o_val - t_val) < 0.05, (o_val, t_val)
    assert abs(o_acc - t_acc) < 0.05, (o_acc, t_acc)
