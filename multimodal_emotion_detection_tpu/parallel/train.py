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
) -> Callable:
    """Jit the train step over ``mesh``.

    Layout: dataset replicated (each device gathers its own batch shard
    from its replica), ``idx``/``valid`` sharded over 'data', TrainState
    sharded by the TP rule, metrics replicated.
    """
    st_shardings = state_shardings(state, mesh, min_shard_dim)
    data_sh = replicated(mesh)
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

    compiled = {}

    def sharded_step(state, features, labels, idx, valid, key):
        struct_key = tuple(sorted(features.keys()))
        if struct_key not in compiled:
            compiled[struct_key] = jax.jit(
                step_fn,
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
