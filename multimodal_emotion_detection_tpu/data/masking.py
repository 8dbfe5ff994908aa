"""Modality availability masks: dropout + missing-modality simulation.

The reference draws a per-sample Bernoulli drop for each modality inside
DataLoader workers with a >=1-modality guarantee
(/root/reference/src/data.py:112-118), and provides
``simulate_missing_modalities`` as a robustness-eval utility
(/root/reference/src/data.py:297-327).

Here mask generation is a *pure jit-compatible function of a PRNG key*, so
it runs inside the compiled train step (no host round-trip) and is
reproducible as a function of (seed, epoch, step).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


def modality_dropout_mask(
    key: jax.Array,
    batch_size: int,
    num_modalities: int,
    dropout_prob: float,
) -> jnp.ndarray:
    """(B, M) float mask: 1=available.  Guarantees >=1 modality per row.

    Jit-safe reformulation of the reference's resample-if-empty logic: rows
    that drop everything get a single uniformly-chosen modality re-enabled.

    ``dropout_prob`` may be a traced scalar (the vmapped grid sweep maps
    members over it); the zero-prob shortcut then falls through — the
    Bernoulli at p=1 and the untriggered fallback give the same all-ones
    mask.
    """
    if isinstance(dropout_prob, (int, float)) and dropout_prob <= 0.0:
        return jnp.ones((batch_size, num_modalities), dtype=jnp.float32)
    keep_key, fix_key = jax.random.split(key)
    keep = jax.random.bernoulli(
        keep_key, p=1.0 - dropout_prob, shape=(batch_size, num_modalities)
    )
    fallback_idx = jax.random.randint(
        fix_key, shape=(batch_size,), minval=0, maxval=num_modalities
    )
    fallback = jax.nn.one_hot(fallback_idx, num_modalities, dtype=jnp.bool_)
    all_dropped = ~jnp.any(keep, axis=-1, keepdims=True)
    keep = jnp.where(all_dropped, fallback, keep)
    return keep.astype(jnp.float32)


def simulate_missing_modalities(
    features: Dict[str, jnp.ndarray],
    mask: jnp.ndarray,
    missing_pattern: Optional[List[int]] = None,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Zero out features for missing modalities and rewrite the mask.

    ``missing_pattern`` lists modality indices to KEEP (None -> use mask),
    matching the reference utility's semantics.
    """
    modality_names = list(features.keys())
    if missing_pattern is not None:
        new_mask = jnp.zeros_like(mask)
        for idx in missing_pattern:
            new_mask = new_mask.at[..., idx].set(1.0)
        mask = new_mask
    out = {}
    for i, name in enumerate(modality_names):
        m = mask[..., i]
        m = m.reshape(m.shape + (1,) * (features[name].ndim - m.ndim))
        out[name] = features[name] * m
    return out, mask


def apply_mask_to_features(
    features: Dict[str, jnp.ndarray], mask: jnp.ndarray, modalities: List[str]
) -> Dict[str, jnp.ndarray]:
    """Multiply each modality's features by its mask column (broadcast)."""
    out = {}
    for i, name in enumerate(modalities):
        m = mask[:, i]
        m = m.reshape((m.shape[0],) + (1,) * (features[name].ndim - 1))
        out[name] = features[name] * m
    return out
