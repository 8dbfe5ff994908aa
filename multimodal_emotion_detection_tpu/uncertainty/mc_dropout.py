"""MC-dropout uncertainty as a single vmapped forward.

The reference loops S sequential forward passes with dropout re-enabled
(/root/reference/src/uncertainty.py:48-86).  Here the S samples are a
``jax.vmap`` over S dropout keys of ONE jit-compiled forward — S× the
batch in one XLA program, so the MXU sees batch B*S instead of S kernel
launches.  BatchNorm stays in running-average mode (``bn_eval=True``),
matching the reference's "only dropout layers in train mode" semantics.
"""

from __future__ import annotations

import weakref
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# jitted forward per model instance (flax modules with dict attrs are not
# hashable, so they cannot ride jit's static_argnums; close over instead).
# Keyed by id(model) for lookup speed, but each entry also carries a
# weakref to the model it was built for and the hit path verifies
# ``ref() is model`` — a bare id-keyed lookup could serve a NEW model the
# stale jitted forward of a dead one whose id() was reused (round-3
# advisor finding).  The closure keeps each cached model alive, so growth
# is bounded explicitly: beyond _CACHE_MAX entries the oldest is evicted
# (insertion order; re-jitting an evicted model is only a retrace).
_FORWARD_CACHE: Dict[Tuple[int, int], Tuple[Any, Any]] = {}
_CACHE_MAX = 16


def _get_mc_forward(model, num_modalities: int):
    dead = [k for k, (ref, _) in _FORWARD_CACHE.items() if ref() is None]
    for k in dead:
        del _FORWARD_CACHE[k]
    cache_key = (id(model), num_modalities)
    hit = _FORWARD_CACHE.get(cache_key)
    if hit is not None and hit[0]() is model:
        # refresh recency so eviction is LRU, not FIFO: a hot model
        # interleaved with 16+ transient ones must not be evicted
        _FORWARD_CACHE[cache_key] = _FORWARD_CACHE.pop(cache_key)
        return hit[1]

    @jax.jit
    def mc_forward(params, model_state, features, keys, mask=None):
        if mask is None:
            b = next(iter(features.values())).shape[0]
            mask = jnp.ones((b, num_modalities), dtype=jnp.float32)
        variables = {"params": params, **model_state}

        def single(key):
            out = model.apply(
                variables,
                features,
                mask,
                deterministic=False,  # dropout ON
                bn_eval=True,  # BatchNorm stays on running averages
                rngs={"dropout": key},
            )
            return out[0] if isinstance(out, tuple) else out

        return jax.vmap(single)(keys)  # (S, B, C)

    while len(_FORWARD_CACHE) >= _CACHE_MAX:
        del _FORWARD_CACHE[next(iter(_FORWARD_CACHE))]
    _FORWARD_CACHE[cache_key] = (weakref.ref(model), mc_forward)
    return mc_forward


def mc_dropout_predict(
    model,
    params: Any,
    model_state: Any,
    features: Dict[str, jnp.ndarray],
    num_samples: int = 10,
    key: Optional[jax.Array] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean_logits (B, C), uncertainty (B,)).

    uncertainty = mean over classes of the across-sample variance of
    softmax probabilities — the reference's definition (uncertainty.py:79-84).
    ``mask`` (B, M) marks modalities present; None means all present
    (callers simulating missing modalities must pass the rewritten mask
    or mask-aware fusion treats zeroed inputs as valid).
    """
    assert num_samples >= 1
    key = key if key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_samples)
    forward = _get_mc_forward(model, len(features))
    logits = forward(params, model_state, features, keys, mask)  # (S, B, C)
    mean_logits = logits.mean(axis=0)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    var_probs = probs.var(axis=0)  # (B, C), population variance
    uncertainty = var_probs.mean(axis=-1)
    return mean_logits, uncertainty
