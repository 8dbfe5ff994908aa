"""Pytree utilities: parameter counting and summaries.

Mirrors the parameter-count report the reference prints via Lightning
(/root/reference/src/train.py:498-501; tables in slurm/slurm_48609405.err).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def count_params(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(np.prod(leaf.shape) for leaf in leaves if hasattr(leaf, "shape")))


def param_bytes(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return int(
        sum(
            np.prod(leaf.shape) * leaf.dtype.itemsize
            for leaf in leaves
            if hasattr(leaf, "shape")
        )
    )


def param_summary(params: Dict[str, Any]) -> str:
    """Per-top-level-module parameter counts, like Lightning's model table."""
    lines = []
    total = 0
    for name, sub in params.items():
        n = count_params(sub)
        total += n
        lines.append(f"  {name}: {n:,} params")
    lines.append(f"Total parameters: {total:,} ({param_bytes(params) / 1e6:.3f} MB)")
    return "\n".join(lines)


def tree_global_norm(tree: Any) -> float:
    leaves = jax.tree_util.tree_leaves(tree)
    sq = sum(float((np.asarray(leaf) ** 2).sum()) for leaf in leaves)
    return float(np.sqrt(sq))
