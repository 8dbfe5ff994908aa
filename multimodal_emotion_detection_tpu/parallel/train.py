"""SPMD train step: the single-device step jitted over a mesh.

The step *body* is identical to training/steps.py — SPMD in JAX is a
layout decision, not a code fork.  ``jax.jit`` with NamedSharding
in/out_shardings partitions it: batch gather and forward/backward run on
per-device batch shards, XLA inserts the gradient ``psum`` over 'data'
(riding ICI) and the activation collectives over 'model' automatically.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from multimodal_emotion_detection_tpu.data.masking import modality_dropout_mask
from multimodal_emotion_detection_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    state_shardings,
)
from multimodal_emotion_detection_tpu.training.steps import TrainState


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    state: TrainState,
    num_modalities: int,
    modality_dropout: float = 0.0,
    has_batch_stats: bool = False,
    min_shard_dim: int = 256,
    donate: bool = True,
    scan_epoch: bool = False,
    scan_block: bool = False,
) -> Callable:
    """Jit the train step over ``mesh``.

    Layout: dataset replicated (each device gathers its own batch shard
    from its replica), ``idx``/``valid`` sharded over 'data', TrainState
    sharded by the TP rule, metrics replicated.

    With ``scan_epoch`` the returned callable takes (S, B) idx/valid
    matrices (batch dim still sharded over 'data') and runs ALL S steps
    as one ``lax.scan`` dispatch — same body, stacked (S,) metrics out.
    ``scan_block`` takes (E, S, B) matrices and runs a whole validation
    block of E epochs per dispatch (training.val_every_n_epochs > 1),
    metrics stacked (E, S).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    st_shardings = state_shardings(state, mesh, min_shard_dim)
    data_sh = replicated(mesh)
    if scan_block:
        bsh = NamedSharding(mesh, P(None, None, "data"))
    elif scan_epoch:
        bsh = NamedSharding(mesh, P(None, "data"))
    else:
        bsh = batch_sharding(mesh)
    rep = replicated(mesh)

    def step_fn(state: TrainState, features, labels, idx, valid, key):
        batch = {m: jnp.take(a, idx, axis=0) for m, a in features.items()}
        batch_labels = jnp.take(labels, idx, axis=0)
        b = idx.shape[0]

        step_key = jax.random.fold_in(key, state.step)
        mask_key, dropout_key = jax.random.split(step_key)
        mask = modality_dropout_mask(mask_key, b, num_modalities,
                                     modality_dropout)
        mask = mask * valid[:, None]

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            if has_batch_stats:
                logits, new_model_state = model.apply(
                    variables, batch, mask,
                    deterministic=False,
                    rngs={"dropout": dropout_key},
                    mutable=list(state.model_state.keys()),
                )
            else:
                logits = model.apply(
                    variables, batch, mask,
                    deterministic=False,
                    rngs={"dropout": dropout_key},
                )
                new_model_state = state.model_state
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch_labels
            )
            denom = jnp.clip(valid.sum(), min=1.0)
            loss = (ce * valid).sum() / denom
            return loss, (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        denom = jnp.clip(valid.sum(), min=1.0)
        preds = jnp.argmax(logits, axis=-1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        metrics: Dict[str, jnp.ndarray] = {
            "loss": loss,
            "acc": ((preds == batch_labels) * valid).sum() / denom,
            "confidence_mean": (probs.max(axis=-1) * valid).sum() / denom,
            "entropy": (
                -(probs * jnp.log(jnp.clip(probs, min=1e-12))).sum(axis=-1)
                * valid
            ).sum() / denom,
            "count": valid.sum(),
        }
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                model_state=new_model_state,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    features_sh = None  # filled per-call structure below

    def in_shardings_for(features):
        return (
            st_shardings,
            {m: data_sh for m in features},
            data_sh,
            bsh,  # idx: batch-sharded -> per-device local gather
            bsh,  # valid
            rep,  # key
        )

    if scan_block:
        from multimodal_emotion_detection_tpu.training.steps import (
            scan_over_epoch_block,
        )

        run_fn = scan_over_epoch_block(step_fn)
    elif scan_epoch:
        from multimodal_emotion_detection_tpu.training.steps import (
            scan_over_epoch,
        )

        run_fn = scan_over_epoch(step_fn)
    else:
        run_fn = step_fn

    compiled = {}

    def sharded_step(state, features, labels, idx, valid, key):
        struct_key = tuple(sorted(features.keys()))
        if struct_key not in compiled:
            compiled[struct_key] = jax.jit(
                run_fn,
                in_shardings=in_shardings_for(features),
                out_shardings=(
                    st_shardings,
                    {"loss": rep, "acc": rep, "confidence_mean": rep,
                     "entropy": rep, "count": rep},
                ),
                donate_argnums=(0,) if donate else (),
            )
        return compiled[struct_key](state, features, labels, idx, valid, key)

    return sharded_step


def make_shardmap_dp_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    num_modalities: int,
    modality_dropout: float = 0.0,
    has_batch_stats: bool = False,
    donate: bool = True,
    row_sharded_split: bool = False,
    scan_epoch: bool = False,
    scan_block: bool = False,
) -> Callable:
    """Data-parallel train step via ``shard_map`` (model axis must be 1).

    With ``scan_epoch`` the callable takes (S, B) idx/valid matrices
    (batch dim sharded over 'data') and the per-device body runs its S
    local steps as one ``lax.scan`` INSIDE shard_map — one dispatch per
    epoch, kernels still lowering on local shapes.  ``scan_block`` is the
    block driver on top of that: (E, S, B) matrices, E epochs per
    dispatch (training.val_every_n_epochs > 1), metrics stacked (E, S).

    The GSPMD path partitions one global program, which prevents the
    manual-DMA Pallas recurrence kernels from lowering (they need local
    shapes, not partitioned operands).  ``shard_map`` runs the step BODY
    per device on its local batch shard — kernels lower per-core exactly
    as on a single chip — and the only collectives are explicit ``psum``
    of gradient/metric sums over 'data' (riding ICI).  Parameters and
    optimizer state stay replicated: every device applies the identical
    psum'd update.

    Numerics match the single-device step exactly: per-device gradients
    of the loss SUM are psum'd then divided by the global valid count —
    the same mean-gradient the global masked-mean loss produces.
    """
    try:  # jax >= 0.8 top-level API; experimental path for older jax
        from jax import shard_map
        _check_kwarg = {"check_vma": False}
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
        _check_kwarg = {"check_rep": False}
    from jax.sharding import PartitionSpec as P

    if mesh.shape.get("model", 1) != 1:
        raise ValueError(
            "shardmap_dp supports data parallelism only "
            f"(model axis = {mesh.shape.get('model', 1)})"
        )

    def per_device(state: TrainState, features, labels, idx, valid, key):
        batch = {m: jnp.take(a, idx, axis=0) for m, a in features.items()}
        batch_labels = jnp.take(labels, idx, axis=0)
        b = idx.shape[0]

        # distinct per-shard randomness: fold in the device's axis index
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        step_key = jax.random.fold_in(key, state.step)
        mask_key, dropout_key = jax.random.split(step_key)
        mask = modality_dropout_mask(mask_key, b, num_modalities,
                                     modality_dropout)
        mask = mask * valid[:, None]

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            if has_batch_stats:
                logits, new_model_state = model.apply(
                    variables, batch, mask,
                    deterministic=False,
                    rngs={"dropout": dropout_key},
                    mutable=list(state.model_state.keys()),
                )
            else:
                logits = model.apply(
                    variables, batch, mask,
                    deterministic=False,
                    rngs={"dropout": dropout_key},
                )
                new_model_state = state.model_state
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch_labels
            )
            return (ce * valid).sum(), (logits, new_model_state)

        (ce_sum, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        count = jnp.clip(jax.lax.psum(valid.sum(), "data"), min=1.0)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "data") / count, grads
        )
        if has_batch_stats:
            new_model_state = jax.tree_util.tree_map(
                lambda s: jax.lax.pmean(s, "data"), new_model_state
            )
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        preds = jnp.argmax(logits, axis=-1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        def gsum(x):
            return jax.lax.psum(x, "data")

        metrics: Dict[str, jnp.ndarray] = {
            "loss": gsum(ce_sum) / count,
            "acc": gsum(((preds == batch_labels) * valid).sum()) / count,
            "confidence_mean": gsum(
                (probs.max(axis=-1) * valid).sum()) / count,
            "entropy": gsum((
                -(probs * jnp.log(jnp.clip(probs, min=1e-12))).sum(axis=-1)
                * valid
            ).sum()) / count,
            "count": gsum(valid.sum()),
        }
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                model_state=new_model_state,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    if scan_block:
        from multimodal_emotion_detection_tpu.training.steps import (
            scan_over_epoch_block,
        )

        body_fn = scan_over_epoch_block(per_device)
        batch_spec = P(None, None, "data")
    elif scan_epoch:
        from multimodal_emotion_detection_tpu.training.steps import (
            scan_over_epoch,
        )

        body_fn = scan_over_epoch(per_device)
        batch_spec = P(None, "data")
    else:
        body_fn = per_device
        batch_spec = P("data")

    compiled = {}

    # row_sharded_split: the split's rows live sharded over 'data'
    # (parallel/data.py) and idx carries LOCAL per-shard indices — each
    # device gathers exclusively from its own block, so the input
    # pipeline needs no ICI at any dataset size
    split_spec = P("data") if row_sharded_split else P()

    def sharded_step(state, features, labels, idx, valid, key):
        struct_key = tuple(sorted(features.keys()))
        if struct_key not in compiled:
            mapped = shard_map(
                body_fn,
                mesh=mesh,
                in_specs=(
                    P(),                      # state: replicated
                    {m: split_spec for m in features},
                    split_spec,               # labels follow the split
                    batch_spec,               # idx: per-device shard
                    batch_spec,               # valid
                    P(),                      # key
                ),
                out_specs=(P(), P()),
                **_check_kwarg,
            )
            compiled[struct_key] = jax.jit(
                mapped, donate_argnums=(0,) if donate else ()
            )
        return compiled[struct_key](state, features, labels, idx, valid, key)

    return sharded_step
