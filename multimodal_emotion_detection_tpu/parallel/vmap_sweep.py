"""Vmapped hyperparameter sweep: G grid members train in ONE XLA program.

The reference's sweep is 12 *sequential* SLURM jobs (sweep.sh:78-179).
SURVEY.md §5 names the TPU-native alternative: "grid sweeps become ...
one-config-per-chip vmap".  Here the learning-rate axis of the grid is
vmapped: G parameter sets + G Adam states + G learning rates stack along a
leading member axis, and a single jitted step trains all members on the
same batch — G small models become one big batched matmul workload that
actually fills the MXU.

Members share the data pipeline and the PRNG stream (same batch order and
dropout draws per member — deterministic and directly comparable; a
single-run trajectory with the same seed is reproduced exactly, tested).

AdamW is decomposed as clip -> scale_by_adam -> (+ wd * p) -> * -lr with
the lr applied as a *traced per-member scalar*, because optax transforms
bake the lr in as a python float.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from multimodal_emotion_detection_tpu.data.masking import modality_dropout_mask


class SweepState(struct.PyTreeNode):
    step: jnp.ndarray  # () shared
    params: any  # leading member axis on every leaf
    opt_state: any  # leading member axis
    lrs: jnp.ndarray  # (G,)
    # non-param collections (e.g. batch_stats for BN encoders), leading
    # member axis; empty dict when the model has none
    model_state: any = struct.field(default_factory=dict)
    # per-member modality-dropout probability (the grid's mDrop axis as a
    # TRACED member dimension); None -> the shared static value passed to
    # make_vmapped_train_step
    mdrops: any = None


def _adam_core(clip_norm: float) -> optax.GradientTransformation:
    parts = []
    if clip_norm and clip_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.scale_by_adam())
    return optax.chain(*parts)


def init_sweep_state(
    model,
    sample_features: Dict[str, jnp.ndarray],
    sample_mask: jnp.ndarray,
    lrs: Sequence[float],
    clip_norm: float,
    seed: int,
    mdrops: Sequence[float] | None = None,
    member_ids: Sequence[int] | None = None,
) -> SweepState:
    g = len(lrs)
    core_tx = _adam_core(clip_norm)

    @jax.jit
    def init_one(rng):
        variables = dict(model.init(rng, sample_features, sample_mask))
        params = variables.pop("params")
        return params, core_tx.init(params), variables

    # distinct init per member (fold_in member id), stacked; member_ids
    # lets a standalone run reproduce a stacked member's init exactly
    # (benchmarks/r4e equality legs)
    ids = list(member_ids) if member_ids is not None else list(range(g))
    assert len(ids) == g
    keys = [jax.random.fold_in(jax.random.PRNGKey(seed), i) for i in ids]
    inits = [init_one(k) for k in keys]
    params = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[p for p, _, _ in inits])
    opt_states = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                        *[o for _, o, _ in inits])
    model_state = (
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                               *[m for _, _, m in inits])
        if inits[0][2] else {}
    )
    return SweepState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_states,
        lrs=jnp.asarray(list(lrs), jnp.float32),
        model_state=model_state,
        mdrops=(jnp.asarray(list(mdrops), jnp.float32)
                if mdrops is not None else None),
    )


def make_vmapped_train_step(
    model,
    num_modalities: int,
    modality_dropout: float,
    clip_norm: float,
    weight_decay: float,
    scan_epoch: bool = False,
) -> Callable:
    """(SweepState, features, labels, idx, valid, key) -> (state, metrics)

    metrics leaves have a leading (G,) member axis.  With ``scan_epoch``
    the callable takes (S, B) idx/valid matrices and runs all S steps as
    one ``lax.scan`` dispatch (metrics gain a leading (S,) axis) — the
    sweep twin of training.steps.make_epoch_train_step.
    """
    core_tx = _adam_core(clip_norm)

    def member_step(params, opt_state, model_state, lr, batch, batch_labels,
                    mask, dropout_key, valid):
        has_bn = bool(model_state)

        def loss_fn(p):
            variables = {"params": p, **model_state}
            if has_bn:
                logits, new_ms = model.apply(
                    variables, batch, mask,
                    deterministic=False, rngs={"dropout": dropout_key},
                    mutable=list(model_state.keys()),
                )
            else:
                logits = model.apply(
                    variables, batch, mask,
                    deterministic=False, rngs={"dropout": dropout_key},
                )
                new_ms = model_state
            if isinstance(logits, tuple):
                logits = logits[0]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch_labels
            )
            denom = jnp.clip(valid.sum(), min=1.0)
            return (ce * valid).sum() / denom, (logits, new_ms)

        (loss, (logits, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        direction, new_opt_state = core_tx.update(grads, opt_state, params)
        # AdamW: p <- p - lr * (adam_dir + wd * p), lr traced per member
        new_params = jax.tree_util.tree_map(
            lambda p, d: p - lr * (d + weight_decay * p), params, direction
        )
        preds = jnp.argmax(logits, axis=-1)
        denom = jnp.clip(valid.sum(), min=1.0)
        acc = ((preds == batch_labels) * valid).sum() / denom
        return new_params, new_opt_state, new_ms, {"loss": loss, "acc": acc}

    def step_fn(state: SweepState, features, labels, idx, valid, key):
        batch = {m: jnp.take(a, idx, axis=0) for m, a in features.items()}
        batch_labels = jnp.take(labels, idx, axis=0)
        b = idx.shape[0]
        step_key = jax.random.fold_in(key, state.step)
        mask_key, dropout_key = jax.random.split(step_key)
        if state.mdrops is not None:
            # grid members carry their own modality-dropout probability:
            # same key, per-member p -> monotone-coupled draws (a member
            # with higher p drops a superset under the shared uniforms)
            mask = jax.vmap(
                lambda p: modality_dropout_mask(mask_key, b,
                                                num_modalities, p)
            )(state.mdrops)
            mask = mask * valid[None, :, None]
            mask_axis = 0
        else:
            mask = modality_dropout_mask(mask_key, b, num_modalities,
                                         modality_dropout)
            mask = mask * valid[:, None]
            mask_axis = None

        new_params, new_opt, new_ms, metrics = jax.vmap(
            member_step,
            in_axes=(0, 0, 0, 0, None, None, mask_axis, None, None),
        )(state.params, state.opt_state, state.model_state, state.lrs,
          batch, batch_labels, mask, dropout_key, valid)
        return (
            state.replace(step=state.step + 1, params=new_params,
                          opt_state=new_opt, model_state=new_ms),
            metrics,
        )

    if scan_epoch:
        from multimodal_emotion_detection_tpu.training.steps import (
            scan_over_epoch,
        )

        return jax.jit(scan_over_epoch(step_fn), donate_argnums=(0,))

    return jax.jit(step_fn, donate_argnums=(0,))


def make_vmapped_eval_step(model, num_modalities: int) -> Callable:
    def step_fn(params, model_state, features, labels, idx, valid):
        batch = {m: jnp.take(a, idx, axis=0) for m, a in features.items()}
        batch_labels = jnp.take(labels, idx, axis=0)
        b = idx.shape[0]
        mask = jnp.ones((b, num_modalities), jnp.float32) * valid[:, None]

        def member(p, ms):
            logits = model.apply({"params": p, **ms}, batch, mask,
                                 deterministic=True)
            if isinstance(logits, tuple):
                logits = logits[0]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch_labels
            )
            preds = jnp.argmax(logits, axis=-1)
            return {
                "loss_sum": (ce * valid).sum(),
                "correct_sum": ((preds == batch_labels) * valid).sum(),
                "count": valid.sum(),
            }

        return jax.vmap(member)(params, model_state)

    return jax.jit(step_fn)


def member_params(state: SweepState, i: int):
    """Unstack one member's parameters (for per-member checkpoints)."""
    return jax.tree_util.tree_map(lambda x: x[i], state.params)


def vmapped_lr_sweep(
    model,
    train_loader,
    val_loader,
    lrs: Sequence[float],
    epochs: int,
    modality_dropout: float = 0.0,
    clip_norm: float = 1.0,
    weight_decay: float = 1e-4,
    seed: int = 42,
) -> List[Dict[str, float]]:
    """Train all lrs at once; returns per-member best-val summaries.

    (No per-member early stopping — members run the full epoch budget; the
    per-epoch val curve is returned so callers can pick each member's best.)
    """
    # The manual-DMA recurrence kernels cannot lower under vmap on TPU
    # (Mosaic requires trivial index maps for ANY-space operands —
    # measured in benchmarks/r2k_tpu.json), and a k-member vmap multiplies
    # the effective batch past the kernels' measured win region anyway
    # (they lose to the XLA scans beyond batch 32, r2c_tpu.json), so the
    # sweep always runs on the scan path.
    from multimodal_emotion_detection_tpu.models.recurrent import (
        set_infer_kernel_enabled,
    )
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    prev_f, prev_b = set_fwd_kernel_mode("off"), set_bwd_kernel_mode("off")
    prev_i = set_infer_kernel_enabled(False)
    try:
        return _vmapped_lr_sweep(
            model, train_loader, val_loader, lrs, epochs, modality_dropout,
            clip_norm, weight_decay, seed,
        )
    finally:
        set_fwd_kernel_mode(prev_f)
        set_bwd_kernel_mode(prev_b)
        set_infer_kernel_enabled(prev_i)


def _vmapped_lr_sweep(
    model,
    train_loader,
    val_loader,
    lrs: Sequence[float],
    epochs: int,
    modality_dropout: float = 0.0,
    clip_norm: float = 1.0,
    weight_decay: float = 1e-4,
    seed: int = 42,
) -> List[Dict[str, float]]:
    feats, labels = train_loader.device_arrays()
    vfeats, vlabels = val_loader.device_arrays()
    m = train_loader.arrays.num_modalities
    b = train_loader.batch_size
    sample = {k: a[:b] for k, a in feats.items()}
    state = init_sweep_state(
        model, sample, jnp.ones((b, m), jnp.float32), lrs, clip_norm, seed
    )
    train_epoch = make_vmapped_train_step(
        model, m, modality_dropout, clip_norm, weight_decay,
        scan_epoch=True,
    )
    eval_step = make_vmapped_eval_step(model, m)
    key = jax.random.PRNGKey(seed)

    g = len(lrs)
    history = []  # per epoch: (G,) val loss / acc
    for epoch in range(epochs):
        idx_all = train_loader.epoch_batch_indices(epoch)
        valid_all = train_loader.epoch_batch_valid()
        state, _ = train_epoch(
            state, feats, labels,
            jnp.asarray(idx_all, dtype=jnp.int32),
            jnp.asarray(valid_all, dtype=jnp.float32), key,
        )
        vidx = val_loader.epoch_batch_indices(0)
        vvalid = val_loader.epoch_batch_valid()
        totals = None
        for bi in range(vidx.shape[0]):
            sums = eval_step(state.params, state.model_state, vfeats, vlabels,
                             jnp.asarray(vidx[bi]), jnp.asarray(vvalid[bi]))
            totals = sums if totals is None else jax.tree_util.tree_map(
                jnp.add, totals, sums
            )
        totals = jax.device_get(totals)
        history.append({
            "val_loss": totals["loss_sum"] / np.maximum(totals["count"], 1),
            "val_acc": totals["correct_sum"] / np.maximum(totals["count"], 1),
        })

    results = []
    for i, lr in enumerate(lrs):
        curve = [float(h["val_loss"][i]) for h in history]
        best_epoch = int(np.argmin(curve))
        results.append({
            "learning_rate": float(lr),
            "best_val_loss": curve[best_epoch],
            "best_epoch": best_epoch,
            "final_val_acc": float(history[-1]["val_acc"][i]),
        })
    return results


def vmapped_grid_sweep(
    model_factory,
    train_loader,
    val_loader,
    lrs: Sequence[float],
    model_dropouts: Sequence[float],
    modality_dropouts: Sequence[float],
    epochs: int,
    clip_norm: float = 1.0,
    weight_decay: float = 1e-4,
    seed: int = 42,
) -> List[Dict[str, float]]:
    """The reference's FULL 3x2x2 grid (sweep.sh:27-29) as stacked
    programs: the lr and modality-dropout axes are TRACED member
    dimensions (lr scales the update; mDrop parameterizes the in-jit
    Bernoulli mask), so each static model-dropout value runs ONE
    vmapped program over its lr x mDrop members.  Flax dropout rates are
    module attributes (static), so the model-dropout axis stays a Python
    loop over programs — 12 sequential runs become
    ``len(model_dropouts)`` dispatch streams of 6 members each.

    ``model_factory(model_dropout) -> model`` builds the member model for
    one static dropout value.  Returns one summary dict per grid member
    with the reference's tag fields.

    Measured verdict (benchmarks/r4e_tpu.json, real chip, 2-layer LSTM
    h256 + frame video, b32 f32, 8 epochs/member): the stacked grid
    LOSES the wall-clock A/B decisively — 588 s vs 52 s for the
    equal-math sequential baseline (the member axis vmaps through the
    whole epoch scan, and the Pallas training kernels are gated off
    under vmap, so each stacked step pays scan-path cost x6 with no
    dispatch saving at these per-step sizes).  Per-tag best_val_loss
    agrees to 3.3e-3 rel (fp accumulation-order drift over 8 trained
    epochs).  Use the sequential sweep (`tools/sweep.py` default) for
    real runs; ``--vmap-grid`` remains an opt-in for tiny models where
    dispatch overhead dominates.
    """
    from multimodal_emotion_detection_tpu.models.recurrent import (
        set_infer_kernel_enabled,
    )
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    prev_f, prev_b = set_fwd_kernel_mode("off"), set_bwd_kernel_mode("off")
    prev_i = set_infer_kernel_enabled(False)
    try:
        results: List[Dict[str, float]] = []
        for mdrop_model in model_dropouts:
            model = model_factory(mdrop_model)
            members = [(lr, md) for lr in lrs for md in modality_dropouts]
            res = _vmapped_grid_members(
                model, train_loader, val_loader, members, epochs,
                clip_norm, weight_decay, seed,
            )
            for (lr, md), r in zip(members, res):
                r.update({"learning_rate": float(lr),
                          "model_dropout": float(mdrop_model),
                          "modality_dropout": float(md)})
                results.append(r)
        return results
    finally:
        set_fwd_kernel_mode(prev_f)
        set_bwd_kernel_mode(prev_b)
        set_infer_kernel_enabled(prev_i)


def _vmapped_grid_members(
    model, train_loader, val_loader, members, epochs,
    clip_norm, weight_decay, seed, member_ids=None,
) -> List[Dict[str, float]]:
    feats, labels = train_loader.device_arrays()
    vfeats, vlabels = val_loader.device_arrays()
    m = train_loader.arrays.num_modalities
    b = train_loader.batch_size
    sample = {k: a[:b] for k, a in feats.items()}
    state = init_sweep_state(
        model, sample, jnp.ones((b, m), jnp.float32),
        [lr for lr, _ in members], clip_norm, seed,
        mdrops=[md for _, md in members],
        member_ids=member_ids,
    )
    train_epoch = make_vmapped_train_step(
        model, m, 0.0, clip_norm, weight_decay, scan_epoch=True,
    )
    eval_step = make_vmapped_eval_step(model, m)
    key = jax.random.PRNGKey(seed)

    history = []
    for epoch in range(epochs):
        idx_all = train_loader.epoch_batch_indices(epoch)
        valid_all = train_loader.epoch_batch_valid()
        state, _ = train_epoch(
            state, feats, labels,
            jnp.asarray(idx_all, dtype=jnp.int32),
            jnp.asarray(valid_all, dtype=jnp.float32), key,
        )
        vidx = val_loader.epoch_batch_indices(0)
        vvalid = val_loader.epoch_batch_valid()
        totals = None
        for bi in range(vidx.shape[0]):
            sums = eval_step(state.params, state.model_state, vfeats,
                             vlabels, jnp.asarray(vidx[bi]),
                             jnp.asarray(vvalid[bi]))
            totals = sums if totals is None else jax.tree_util.tree_map(
                jnp.add, totals, sums
            )
        totals = jax.device_get(totals)
        history.append({
            "val_loss": totals["loss_sum"] / np.maximum(totals["count"], 1),
            "val_acc": totals["correct_sum"] / np.maximum(totals["count"], 1),
        })

    results = []
    for i in range(len(members)):
        curve = [float(h["val_loss"][i]) for h in history]
        best_epoch = int(np.argmin(curve))
        results.append({
            "best_val_loss": curve[best_epoch],
            "best_epoch": best_epoch,
            "final_val_acc": float(history[-1]["val_acc"][i]),
        })
    return results


def train_ensemble(
    model,
    train_loader,
    n_members: int,
    epochs: int,
    learning_rate: float = 1e-3,
    modality_dropout: float = 0.0,
    clip_norm: float = 1.0,
    weight_decay: float = 1e-4,
    seed: int = 42,
):
    """Train N independently-initialized ensemble members in ONE jitted
    program (same lr, member-index-folded init seeds).  Returns
    ``(stacked_params, stacked_model_state)`` consumed directly by
    uncertainty.ensemble.ensemble_predict — the reference trains its
    EnsembleUncertainty members one at a time (uncertainty.py:419-468).
    """
    # scan path only under vmap (see vmapped_lr_sweep's note)
    from multimodal_emotion_detection_tpu.models.recurrent import (
        set_infer_kernel_enabled,
    )
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    prev_f, prev_b = set_fwd_kernel_mode("off"), set_bwd_kernel_mode("off")
    prev_i = set_infer_kernel_enabled(False)
    try:
        return _train_ensemble(
            model, train_loader, n_members, epochs, learning_rate,
            modality_dropout, clip_norm, weight_decay, seed,
        )
    finally:
        set_fwd_kernel_mode(prev_f)
        set_bwd_kernel_mode(prev_b)
        set_infer_kernel_enabled(prev_i)


def _train_ensemble(
    model,
    train_loader,
    n_members: int,
    epochs: int,
    learning_rate: float = 1e-3,
    modality_dropout: float = 0.0,
    clip_norm: float = 1.0,
    weight_decay: float = 1e-4,
    seed: int = 42,
):
    feats, labels = train_loader.device_arrays()
    m = train_loader.arrays.num_modalities
    b = train_loader.batch_size
    sample = {k: a[:b] for k, a in feats.items()}
    state = init_sweep_state(
        model, sample, jnp.ones((b, m), jnp.float32),
        [learning_rate] * n_members, clip_norm, seed,
    )
    epoch_step = make_vmapped_train_step(
        model, m, modality_dropout, clip_norm, weight_decay,
        scan_epoch=True,
    )
    key = jax.random.PRNGKey(seed)
    for epoch in range(epochs):
        idx_all = train_loader.epoch_batch_indices(epoch)
        valid_all = train_loader.epoch_batch_valid()
        state, _ = epoch_step(state, feats, labels,
                              jnp.asarray(idx_all, dtype=jnp.int32),
                              jnp.asarray(valid_all, dtype=jnp.float32),
                              key)
    # stacked (N, ...) pytrees; model_state is {} for BN-free models
    return state.params, state.model_state
