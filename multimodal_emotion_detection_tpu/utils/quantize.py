"""Weight-only quantization for serving artifacts.

Per-output-channel symmetric int8 quantization of the parameter pytree:
every float matrix/tensor of at least ``min_size`` elements is stored as
``int8`` codes plus one f32 scale per output channel (the LAST axis — the
output-features axis of flax ``Dense``/LSTM/GRU kernels, so each output
neuron keeps its own dynamic range).  Small leaves (biases, LayerNorm
scales, BatchNorm stats) stay f32 — they are a rounding-error fraction of
the bytes and matter most for accuracy.

The artifact is ~4x smaller than the f32 checkpoint; at load time the
weights dequantize to f32 (or bf16) and serving runs the standard jitted
forward — weight-only PTQ, the deployment-standard starting point.  The
reference has no quantization story at all (its serving path is a
Lightning test loop, SURVEY.md §3.3).

Error bound: symmetric round-to-nearest over 127 levels gives
``|w - deq(w)| <= scale/2 = max|w_channel| / 254`` elementwise.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Leaves smaller than this stay unquantized (biases, norm params).
DEFAULT_MIN_SIZE = 1024


def _quantize_leaf(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Symmetric per-last-axis-channel int8 codes + f32 scales."""
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale.astype(np.float32)}


def _dequantize_leaf(entry: Dict[str, np.ndarray], dtype) -> jnp.ndarray:
    q = np.asarray(entry["q"], np.float32)
    return jnp.asarray(q * np.asarray(entry["scale"], np.float32), dtype)


def _is_float_dtype(dtype) -> bool:
    # jnp.issubdtype (not np.) so ml_dtypes leaves — bfloat16 params from
    # a bf16 cast or checkpoint — quantize instead of silently passing
    # through
    return jnp.issubdtype(dtype, jnp.floating)


def quantize_tree(
    params: Any, min_size: int = DEFAULT_MIN_SIZE
) -> Tuple[Any, Dict[str, int]]:
    """Quantize a parameter pytree for serving.

    Returns ``(qtree, stats)``.  ``qtree`` mirrors ``params`` with every
    qualifying leaf replaced by ``{"::int8::": {"q", "scale"}}`` (the
    sentinel key cannot collide with flax module names, which are valid
    Python identifiers).  ``stats`` reports bytes before/after.
    """
    flat, treedef = jax.tree_util.tree_flatten(params)
    out, before, after = [], 0, 0
    for leaf in flat:
        arr = np.asarray(leaf)
        is_float = _is_float_dtype(leaf.dtype if hasattr(leaf, "dtype")
                                   else arr.dtype)
        # "bytes_f32" is the f32-EQUIVALENT size, so the compression
        # ratio stays honestly labeled even for bf16 input checkpoints
        before += 4 * arr.size if is_float else arr.nbytes
        if (
            is_float
            and arr.ndim >= 2
            and arr.size >= min_size
        ):
            entry = _quantize_leaf(arr)
            after += entry["q"].nbytes + entry["scale"].nbytes
            out.append({"::int8::": entry})
        else:
            after += arr.nbytes
            out.append(arr)
    stats = {"bytes_f32": int(before), "bytes_quantized": int(after)}
    return jax.tree_util.tree_unflatten(treedef, out), stats


def dequantize_tree(qtree: Any, dtype=jnp.float32) -> Any:
    """Inverse of :func:`quantize_tree` (weights come back as ``dtype``)."""

    def is_q(node):
        return isinstance(node, dict) and set(node) == {"::int8::"}

    def deq(node):
        if is_q(node):
            return _dequantize_leaf(node["::int8::"], dtype)
        return jnp.asarray(node)

    return jax.tree_util.tree_map(deq, qtree, is_leaf=is_q)


def quantize_params_for_eval(
    params: Any, mode: str, min_size: int = DEFAULT_MIN_SIZE
) -> Any:
    """Round-trip ``params`` through the serving representation.

    ``mode``: 'int8' (weight-only PTQ round-trip, f32 compute),
    'int8-bf16' (dequantize into bf16 weights), 'bfloat16' (plain bf16
    weight cast), or 'none'.
    """
    if mode in (None, "none"):
        return params
    if mode == "bfloat16":
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if _is_float_dtype(getattr(a, "dtype", np.asarray(a).dtype))
            else jnp.asarray(a),
            params,
        )
    if mode in ("int8", "int8-bf16"):
        qtree, _ = quantize_tree(params, min_size=min_size)
        return dequantize_tree(
            qtree, jnp.bfloat16 if mode == "int8-bf16" else jnp.float32
        )
    raise ValueError(f"unknown quantization mode: {mode!r}")


def save_quantized(path, params: Any, meta: Dict[str, Any] | None = None,
                   min_size: int = DEFAULT_MIN_SIZE) -> Dict[str, int]:
    """Quantize ``params`` and write a msgpack serving artifact."""
    from pathlib import Path

    import flax.serialization as fser

    qtree, stats = quantize_tree(params, min_size=min_size)
    payload = {
        "format": "int8-weight-only-v1",
        "quantized": jax.tree_util.tree_map(np.asarray, qtree),
        "meta": dict(meta or {}),
    }
    data = fser.msgpack_serialize(payload)
    Path(path).write_bytes(data)
    stats["bytes_file"] = len(data)
    return stats


def load_quantized(path, dtype=jnp.float32) -> Tuple[Any, Dict[str, Any]]:
    """Load a :func:`save_quantized` artifact -> (params, meta)."""
    from pathlib import Path

    import flax.serialization as fser

    payload = fser.msgpack_restore(Path(path).read_bytes())
    if payload.get("format") != "int8-weight-only-v1":
        raise ValueError(f"not an int8 serving artifact: {path}")
    return dequantize_tree(payload["quantized"], dtype), payload.get(
        "meta", {})
