"""Jit-compiled train/eval steps over a functional TrainState.

Replaces the Lightning training/validation/test steps
(/root/reference/src/train.py:93-232) with pure functions:

* one ``train_step(state, data, idx, valid, key)`` that *gathers the batch
  on-device* from the HBM-resident split, generates the modality-dropout
  mask from an explicit PRNG key, runs forward+backward+optimizer update,
  and returns the metrics the reference logs (loss/acc/confidence_mean) —
  all inside a single XLA program;
* one ``eval_step`` returning exact per-batch metric *sums* (so epoch
  aggregation over uneven batches is exact) plus logits for test-time
  confusion/calibration artifacts.

Batch-stats (BatchNorm) collections are threaded when the model has them
(cnn/mlp encoders), otherwise elided at trace time.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from multimodal_emotion_detection_tpu.data.masking import modality_dropout_mask


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    model_state: Any  # e.g. {'batch_stats': ...}; empty dict if unused
    opt_state: Any


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    sample_features: Dict[str, jnp.ndarray],
    sample_mask: jnp.ndarray,
    rng: jax.Array,
) -> TrainState:
    """Initialize parameters (jitted — one XLA program, not one per param)."""

    @jax.jit
    def init(rng):
        return model.init(rng, sample_features, sample_mask)

    variables = init(rng)
    variables = core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(
        variables
    )
    params = variables.pop("params")
    model_state = variables  # whatever is left (batch_stats, ...)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=opt_state,
    )


def _cross_entropy(logits, labels, valid):
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    denom = jnp.clip(valid.sum(), min=1.0)
    return (ce * valid).sum() / denom


def _batch_metrics(logits, labels, valid) -> Dict[str, jnp.ndarray]:
    denom = jnp.clip(valid.sum(), min=1.0)
    preds = jnp.argmax(logits, axis=-1)
    acc = ((preds == labels) * valid).sum() / denom
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    conf = (probs.max(axis=-1) * valid).sum() / denom
    ent = (
        -(probs * jnp.log(jnp.clip(probs, min=1e-12))).sum(axis=-1) * valid
    ).sum() / denom
    return {"acc": acc, "confidence_mean": conf, "entropy": ent}


def _make_train_step_body(
    model,
    tx: optax.GradientTransformation,
    num_modalities: int,
    modality_dropout: float = 0.0,
    has_batch_stats: bool = False,
) -> Callable:
    """The un-jitted gather+forward+backward+update body shared by the
    per-step (`make_train_step`) and epoch-scan (`make_epoch_train_step`)
    wrappers."""

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
                    variables,
                    batch,
                    mask,
                    deterministic=False,
                    rngs={"dropout": dropout_key},
                    mutable=list(state.model_state.keys()),
                )
            else:
                logits = model.apply(
                    variables,
                    batch,
                    mask,
                    deterministic=False,
                    rngs={"dropout": dropout_key},
                )
                new_model_state = state.model_state
            loss = _cross_entropy(logits, batch_labels, valid)
            return loss, (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **_batch_metrics(logits, batch_labels, valid),
                   "count": valid.sum()}
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return step_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    num_modalities: int,
    modality_dropout: float = 0.0,
    has_batch_stats: bool = False,
    donate: bool = True,
) -> Callable:
    """Build the jitted gather+forward+backward+update step.

    Signature of the returned function::

        new_state, metrics = train_step(state, features, labels, idx, valid, key)

    ``features``/``labels`` are the FULL split (device-resident); ``idx`` is
    the (B,) gather index for this batch; ``valid`` is the (B,) real-row
    mask; ``key`` is a per-run base key (step number is folded in).
    """
    step_fn = _make_train_step_body(
        model, tx, num_modalities, modality_dropout, has_batch_stats
    )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def scan_over_epoch(step_fn: Callable, pregather: bool = False) -> Callable:
    """Lift a per-batch step into a one-dispatch-per-epoch driver.

    ``step_fn(state, features, labels, idx, valid, key)`` becomes
    ``epoch_fn(state, features, labels, idx_mat, valid_mat, key)`` that
    ``lax.scan``s over the (S, B) epoch matrices.  Shared by the plain,
    GSPMD, shard_map, and vmapped-sweep drivers so the key-folding /
    carry semantics cannot diverge between them.

    ``pregather=True`` hoists the per-step batch gather out of the scan:
    the whole epoch's rows are gathered ONCE up front (one large HBM
    gather instead of S small ones on the scan's critical path) and the
    scan consumes contiguous (S, B, ...) slices; the per-step body then
    sees an identity gather XLA folds away.  Bitwise-identical batches
    and trajectories — only the gather schedule changes.  Costs one
    epoch-sized copy of the split in HBM, so it is opt-in
    (``runtime.epoch_pregather``).  Measured on v5e it is ~1-2% SLOWER
    in both flagship regimes (benchmarks/r3e_tpu.json): the in-scan
    gathers already overlap with compute.
    """

    def epoch_fn(state, features, labels, idx_mat, valid_mat, key):
        if pregather:
            s, b = idx_mat.shape
            flat = idx_mat.reshape(-1)
            feats_e = {
                m: jnp.take(a, flat, axis=0).reshape((s, b) + a.shape[1:])
                for m, a in features.items()
            }
            labels_e = jnp.take(labels, flat, axis=0).reshape(s, b)
            ident = jnp.arange(b, dtype=idx_mat.dtype)

            def body_pg(st, xs):
                feats_b, labels_b, valid = xs
                return step_fn(st, feats_b, labels_b, ident, valid, key)

            return jax.lax.scan(
                body_pg, state, (feats_e, labels_e, valid_mat)
            )

        def body(st, xs):
            idx, valid = xs
            return step_fn(st, features, labels, idx, valid, key)

        return jax.lax.scan(body, state, (idx_mat, valid_mat))

    return epoch_fn


def make_epoch_train_step(
    model,
    tx: optax.GradientTransformation,
    num_modalities: int,
    modality_dropout: float = 0.0,
    has_batch_stats: bool = False,
    donate: bool = True,
    pregather: bool = False,
) -> Callable:
    """Scan the train step over ALL batches of an epoch in ONE dispatch.

    Signature::

        new_state, stacked_metrics = epoch_step(
            state, features, labels, idx_mat, valid_mat, key)

    ``idx_mat``/``valid_mat`` are (S, B) — one row per batch.  The body is
    bit-identical to ``make_train_step``'s (same key folding: the step
    counter advances inside the carry), so per-step metric trajectories
    match the per-step dispatch path exactly; stacked_metrics leaves have
    a leading (S,) axis.

    Why: on hosts where per-step dispatch latency rivals the step's device
    time (measured 1.63x on the tunneled v5e: benchmarks/r2r_tpu.json),
    driving the whole epoch as one XLA while-loop removes the host from
    the inner loop.  Data must already be device-resident — which the
    HBM-resident split path guarantees (SURVEY.md §5 'Distributed').
    """
    step_fn = _make_train_step_body(
        model, tx, num_modalities, modality_dropout, has_batch_stats
    )
    return jax.jit(scan_over_epoch(step_fn, pregather=pregather),
                   donate_argnums=(0,) if donate else ())


def make_multi_epoch_train_step(
    model,
    tx: optax.GradientTransformation,
    num_modalities: int,
    modality_dropout: float = 0.0,
    has_batch_stats: bool = False,
    donate: bool = True,
    pregather: bool = False,
) -> Callable:
    """Scan a BLOCK of epochs in ONE dispatch (scan of epoch scans).

    ``(state, feats, labels, idx_mats (E,S,B), valid_mats (E,S,B), key)
    -> (state, metrics stacked (E,S))``.  The body is the same
    ``scan_over_epoch`` epoch function with the same per-epoch ``key``
    (PRNG streams are distinguished by the ``state.step`` fold-in), so
    per-step trajectories are bit-identical to E separate epoch
    dispatches — tested.  Used by the Trainer when
    ``training.val_every_n_epochs > 1``: validation, checkpointing and
    early stopping run at block boundaries (Lightning's
    ``check_val_every_n_epoch`` semantics), and the r3i trace showed
    ~40% of flagship wall-time was per-epoch dispatch gaps this removes.
    """
    step_fn = _make_train_step_body(
        model, tx, num_modalities, modality_dropout, has_batch_stats
    )
    return jax.jit(scan_over_epoch_block(step_fn, pregather=pregather),
                   donate_argnums=(0,) if donate else ())


def scan_over_epoch_block(step_fn: Callable,
                          pregather: bool = False) -> Callable:
    """Lift a per-batch step into the BLOCK driver: scan of epoch scans.

    ``step_fn(state, features, labels, idx, valid, key)`` becomes
    ``block_fn(state, features, labels, idx_mats (E,S,B),
    valid_mats (E,S,B), key) -> (state, metrics stacked (E,S))``.
    Shared by the plain, GSPMD and shard_map drivers (same reuse shape
    as ``scan_over_epoch``, including the opt-in ``pregather`` gather
    hoist — per EPOCH, not per block, so the extra HBM copy stays
    epoch-sized); the per-epoch ``key`` is identical because PRNG
    streams are keyed by the ``state.step`` fold-in.
    """
    epoch_fn = scan_over_epoch(step_fn, pregather=pregather)

    def block_fn(state, features, labels, idx_mats, valid_mats, key):
        def body(st, xs):
            idx_mat, valid_mat = xs
            return epoch_fn(st, features, labels, idx_mat, valid_mat, key)

        return jax.lax.scan(body, state, (idx_mats, valid_mats))

    return block_fn


def _make_eval_step_body(model, num_modalities: int) -> Callable:
    def step_fn(params, model_state, features, labels, idx, valid):
        batch = {m: jnp.take(a, idx, axis=0) for m, a in features.items()}
        batch_labels = jnp.take(labels, idx, axis=0)
        b = idx.shape[0]
        mask = jnp.ones((b, num_modalities), dtype=jnp.float32) * valid[:, None]

        variables = {"params": params, **model_state}
        logits = model.apply(variables, batch, mask, deterministic=True)
        if isinstance(logits, tuple):
            logits = logits[0]

        ce = optax.softmax_cross_entropy_with_integer_labels(logits, batch_labels)
        preds = jnp.argmax(logits, axis=-1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        conf = probs.max(axis=-1)
        ent = -(probs * jnp.log(jnp.clip(probs, min=1e-12))).sum(axis=-1)
        sums = {
            "loss_sum": (ce * valid).sum(),
            "correct_sum": ((preds == batch_labels) * valid).sum(),
            "conf_sum": (conf * valid).sum(),
            "entropy_sum": (ent * valid).sum(),
            "count": valid.sum(),
        }
        return sums, (logits, preds, batch_labels)

    return step_fn


def make_eval_step(model, num_modalities: int) -> Callable:
    """Jitted eval step returning exact metric sums + logits.

    Returns ``(sums, logits)`` where sums has keys loss_sum / correct_sum /
    conf_sum / entropy_sum / count.
    """
    return jax.jit(_make_eval_step_body(model, num_modalities))


def make_epoch_eval_step(model, num_modalities: int) -> Callable:
    """Scan the eval step over ALL batches of a split in ONE dispatch.

    Signature::

        totals, (logits, preds, labels) = epoch_eval(
            params, model_state, features, labels, idx_mat, valid_mat)

    ``totals`` are the summed metric sums over all S batches (exact, same
    order-independent adds as the per-step loop); the collected arrays are
    stacked (S, B, ...).  Same dispatch-amortization rationale as
    ``make_epoch_train_step``; parameters are invariant across the scan so
    XLA hoists any layout conversion once.
    """
    step_fn = _make_eval_step_body(model, num_modalities)

    def epoch_fn(params, model_state, features, labels, idx_mat, valid_mat):
        def body(totals, xs):
            idx, valid = xs
            sums, out = step_fn(
                params, model_state, features, labels, idx, valid
            )
            return jax.tree_util.tree_map(jnp.add, totals, sums), out

        zero = {
            k: jnp.zeros((), jnp.float32)
            for k in ("loss_sum", "correct_sum", "conf_sum", "entropy_sum",
                      "count")
        }
        totals, outs = jax.lax.scan(body, zero, (idx_mat, valid_mat))
        return totals, outs

    return jax.jit(epoch_fn)


def make_forward_fn(model, num_modalities: int) -> Callable:
    """Plain jitted inference forward: (params, model_state, features[,mask])
    -> logits.  The serving-path entry (SURVEY.md §3.3)."""

    @jax.jit
    def forward(params, model_state, features, mask=None):
        b = next(iter(features.values())).shape[0]
        if mask is None:
            mask = jnp.ones((b, num_modalities), dtype=jnp.float32)
        variables = {"params": params, **model_state}
        logits = model.apply(variables, features, mask, deterministic=True)
        return logits[0] if isinstance(logits, tuple) else logits

    return forward


def make_batched_forward_fn(model, num_modalities: int) -> Callable:
    """Throughput-serving forward: S microbatches in ONE dispatch.

    ``forward_many(params, model_state, features[, mask]) -> (S, B, C)``
    where every ``features`` leaf is stacked (S, B, ...).  A ``lax.scan``
    over the microbatch axis keeps peak activation memory at one batch
    while amortizing host dispatch across all S — the serving twin of
    ``make_epoch_train_step`` (the b32 serving forward measured ~1 ms
    dispatch vs ~1 ms device time: benchmarks/serving_tpu.json).
    Numerics per microbatch are identical to ``make_forward_fn`` (tested).
    """

    @jax.jit
    def forward_many(params, model_state, features, mask=None):
        lead = next(iter(features.values()))
        s, b = lead.shape[0], lead.shape[1]
        if mask is None:
            mask = jnp.ones((s, b, num_modalities), dtype=jnp.float32)
        variables = {"params": params, **model_state}

        def body(carry, xs):
            feats, m = xs
            logits = model.apply(variables, feats, m, deterministic=True)
            return carry, logits[0] if isinstance(logits, tuple) else logits

        _, logits = jax.lax.scan(body, 0, (features, mask))
        return logits

    return forward_many
