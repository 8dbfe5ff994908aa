"""Ensemble uncertainty, vectorized over stacked parameter pytrees.

The reference iterates a Python list of models
(/root/reference/src/uncertainty.py:419-468).  With a shared architecture,
N parameter sets stack into one pytree with a leading ensemble axis and a
single vmap evaluates all members in one XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def stack_params(param_sets: Sequence[Any]) -> Any:
    """Stack N same-structure parameter pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *param_sets)


def ensemble_predict(
    model,
    stacked_params: Any,
    stacked_model_state: Any,
    features: Dict[str, jnp.ndarray],
    num_modalities: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean softmax probs (B, C), uncertainty (B,)).

    uncertainty = across-member variance of probs, averaged over classes
    (the reference's definition).
    """
    m = num_modalities if num_modalities is not None else len(features)
    b = next(iter(features.values())).shape[0]
    mask = jnp.ones((b, m), dtype=jnp.float32)

    @jax.jit
    def run(params_stack, state_stack):
        def single(params, model_state):
            variables = {"params": params, **model_state}
            out = model.apply(variables, features, mask, deterministic=True)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        return jax.vmap(single)(params_stack, state_stack)  # (N, B, C)

    # the manual-DMA inference kernel cannot lower under vmap on TPU
    # (benchmarks/r2k_tpu.json); trace this forward on the scan path
    from multimodal_emotion_detection_tpu.models.recurrent import (
        set_infer_kernel_enabled,
    )

    prev = set_infer_kernel_enabled(False)
    try:
        probs = run(stacked_params, stacked_model_state)
    finally:
        set_infer_kernel_enabled(prev)
    mean_probs = probs.mean(axis=0)
    uncertainty = probs.var(axis=0).mean(axis=-1)
    return mean_probs, uncertainty


def ensemble_predict_list(
    model, param_sets: List[Any], state_sets: List[Any], features
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper taking Python lists of (params, model_state)."""
    return ensemble_predict(
        model,
        stack_params(param_sets),
        stack_params(state_sets),
        features,
    )
