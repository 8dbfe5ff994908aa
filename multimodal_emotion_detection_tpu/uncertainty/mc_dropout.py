"""MC-dropout uncertainty as a single vmapped forward.

The reference loops S sequential forward passes with dropout re-enabled
(/root/reference/src/uncertainty.py:48-86).  Here the S samples are a
``jax.vmap`` over S dropout keys of ONE jit-compiled forward — S× the
batch in one XLA program, so the MXU sees batch B*S instead of S kernel
launches.  BatchNorm stays in running-average mode (``bn_eval=True``),
matching the reference's "only dropout layers in train mode" semantics.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# jitted forward per model instance (flax modules with dict attrs are not
# hashable, so they cannot ride jit's static_argnums; close over instead)
_FORWARD_CACHE: Dict[int, Any] = {}


def _get_mc_forward(model, num_modalities: int):
    cache_key = (id(model), num_modalities)
    if cache_key not in _FORWARD_CACHE:

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

        _FORWARD_CACHE[cache_key] = mc_forward
    return _FORWARD_CACHE[cache_key]


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
