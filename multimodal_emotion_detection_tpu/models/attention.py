"""Attention mechanisms for multimodal fusion (flax.linen).

Re-designs /root/reference/src/attention.py with identical interface
semantics (mask conventions, return values) but branch-free, jit-friendly
compute.  Notable divergences from the reference, on purpose:

* ``PairwiseModalityAttention`` is defined ONCE (the reference defines it
  twice and Python's last-def-wins shadows the first — attention.py:276 vs
  :421; we implement the active second definition).
* The reference skips a cross-attention direction when a modality is
  missing for *every* sample in the batch (``if b_ok.any()``, a
  data-dependent Python branch).  Here every direction always computes and
  per-sample key masks zero out invalid messages — the same per-sample
  result, with one static XLA graph.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_LARGE = -1e4  # fp16/bf16-safe "minus infinity" (ref attention.py:117-118)


def normalize_key_mask(
    mask: jnp.ndarray, batch: int, t_k: int
) -> jnp.ndarray:
    """Normalize a key mask to boolean INVALID of shape (B, Tk).

    Accepts (B,), (B,1) or (B,Tk); boolean masks mean True=INVALID, numeric
    masks mean 1=valid (auto-inverted) — exactly the convention of
    CrossModalAttention._normalize_mask (ref attention.py:57-78).
    """
    if mask.dtype == jnp.bool_:
        invalid = mask
    else:
        invalid = mask <= 0
    if invalid.ndim == 1:
        invalid = jnp.broadcast_to(invalid[:, None], (batch, t_k))
    elif invalid.ndim == 2:
        if invalid.shape[1] == 1:
            invalid = jnp.broadcast_to(invalid, (batch, t_k))
        elif invalid.shape[1] != t_k:
            raise ValueError(f"Mask width {invalid.shape[1]} != Tk {t_k}")
    else:
        raise ValueError(f"Mask must be [B] or [B,Tk], got {invalid.shape}")
    return invalid


class CrossModalAttention(nn.Module):
    """Multi-head cross-modal attention with separate q/k dims.

    Ref attention.py:14-141.  Inputs may be (B, D) or (B, T, D); returns
    ``(out, attn)`` where out is (B, D) if Tq == 1 else (B, Tq, D) and attn
    is (B, H, Tq, Tk).  Input LayerNorms stabilize per-modality scales;
    fully-masked rows yield zero attention (not NaN).
    """

    query_dim: int
    key_dim: int
    hidden_dim: int
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.hidden_dim % self.num_heads == 0
        head_dim = self.hidden_dim // self.num_heads
        scale = 1.0 / math.sqrt(head_dim)

        squeeze_out = query.ndim == 2
        if query.ndim == 2:
            query = query[:, None, :]
        if key.ndim == 2:
            key = key[:, None, :]
        if value.ndim == 2:
            value = value[:, None, :]

        b, t_q, _ = query.shape
        t_k = key.shape[1]

        query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="q_in_ln")(
            query.astype(self.dtype)
        )
        key = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="k_in_ln")(key.astype(self.dtype))
        value = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="v_in_ln")(
            value.astype(self.dtype)
        )

        q = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(self.hidden_dim, dtype=self.dtype, name="v_proj")(value)

        q = q.reshape(b, t_q, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t_k, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_k, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale

        invalid = None
        if mask is not None:
            invalid = normalize_key_mask(mask, b, t_k)
            scores = jnp.where(invalid[:, None, None, :], NEG_LARGE, scores)

        attn = jax.nn.softmax(scores, axis=-1)
        if invalid is not None:
            # all-masked rows -> zero distribution, not NaN (ref :123-128)
            all_masked = jnp.all(invalid, axis=-1)  # (B,)
            attn = jnp.where(all_masked[:, None, None, None], 0.0, attn)

        attn = nn.Dropout(rate=self.dropout)(attn, deterministic=deterministic)
        context = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        context = context.transpose(0, 2, 1, 3).reshape(b, t_q, self.hidden_dim)
        out = nn.Dense(self.hidden_dim, dtype=self.dtype, name="out_proj")(context)
        if squeeze_out and t_q == 1:
            out = out[:, 0, :]
        return out, attn


class TemporalAttention(nn.Module):
    """Self-attention over timesteps + attention-based pooling.

    Ref attention.py:143-274.  ``mask`` is (B, S) with True/1 = VALID
    timestep (note: opposite of CrossModalAttention's key mask).
    """

    feature_dim: int
    hidden_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sequence: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, s, _ = sequence.shape
        h, hd = self.num_heads, self.hidden_dim // self.num_heads
        scale = hd ** -0.5
        x = sequence.astype(self.dtype)

        q = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.hidden_dim, dtype=self.dtype, name="v_proj")(x)

        def to_heads(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if mask is not None:
            valid = mask.astype(bool)
            logits = jnp.where(valid[:, None, None, :], logits, -jnp.inf)
        weights = jax.nn.softmax(logits, axis=-1)
        weights = nn.Dropout(rate=self.dropout)(weights, deterministic=deterministic)
        context = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        if mask is not None:
            context = context * mask.astype(context.dtype)[:, None, :, None]
        context = context.transpose(0, 2, 1, 3).reshape(b, s, self.hidden_dim)
        attended = nn.Dense(self.hidden_dim, dtype=self.dtype, name="out_proj")(
            context
        )
        return attended, weights

    @staticmethod
    def pool_sequence(
        sequence: jnp.ndarray, attention_weights: jnp.ndarray
    ) -> jnp.ndarray:
        """Key-importance pooling: mean attn over heads & queries -> weights
        over keys -> weighted sum of the sequence (ref :246-274)."""
        key_importance = attention_weights.mean(axis=1).mean(axis=1)  # (B, S)
        key_importance = key_importance / (
            key_importance.sum(axis=1, keepdims=True) + 1e-9
        )
        return jnp.einsum("bs,bsd->bd", key_importance, sequence)


class PairwiseModalityAttention(nn.Module):
    """All-directional cross-modal message passing.

    Ref attention.py:421-548 (the *active* second definition): for M
    modalities, M*(M-1) directional CrossModalAttentions keyed
    ``"{a}_to_{b}"``; per-modality message sum + self-projection residual +
    LayerNorm; fully-missing modalities zeroed.
    """

    modality_dims: Dict[str, int]
    hidden_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        modality_features: Dict[str, jnp.ndarray],
        modality_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        names = list(self.modality_dims.keys())
        m = len(names)
        first = next(iter(modality_features.values()))
        b = first.shape[0]

        if modality_mask is not None:
            avail = {
                name: modality_mask[:, i] > 0 if modality_mask.dtype != jnp.bool_
                else modality_mask[:, i]
                for i, name in enumerate(names)
            }
        else:
            avail = {name: jnp.ones((b,), dtype=bool) for name in names}

        messages: Dict[str, list] = {name: [] for name in names}
        attention_maps: Dict[str, jnp.ndarray] = {}

        for i in range(m):
            for j in range(i + 1, m):
                a, bb = names[i], names[j]
                xa, xb = modality_features[a], modality_features[bb]
                # a attends to b's features; keys invalid where b missing
                out_ab, att_ab = CrossModalAttention(
                    query_dim=self.modality_dims[a],
                    key_dim=self.modality_dims[bb],
                    hidden_dim=self.hidden_dim,
                    num_heads=self.num_heads,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"{a}_to_{bb}",
                )(xa, xb, xb, mask=~avail[bb], deterministic=deterministic)
                messages[a].append(out_ab)
                attention_maps[f"{a}_to_{bb}"] = att_ab

                out_ba, att_ba = CrossModalAttention(
                    query_dim=self.modality_dims[bb],
                    key_dim=self.modality_dims[a],
                    hidden_dim=self.hidden_dim,
                    num_heads=self.num_heads,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"{bb}_to_{a}",
                )(xb, xa, xa, mask=~avail[a], deterministic=deterministic)
                messages[bb].append(out_ba)
                attention_maps[f"{bb}_to_{a}"] = att_ba

        attended: Dict[str, jnp.ndarray] = {}
        out_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_ln")
        for name in names:
            if messages[name]:
                msg_sum = sum(messages[name])
            else:
                msg_sum = jnp.zeros((b, self.hidden_dim), dtype=self.dtype)
            msg_sum = nn.Dropout(rate=self.dropout)(
                msg_sum, deterministic=deterministic
            )
            self_feat = nn.Dense(
                self.hidden_dim, dtype=self.dtype, name=f"self_proj_{name}"
            )(modality_features[name].astype(self.dtype))
            agg = out_ln(self_feat + msg_sum)
            agg = agg * avail[name].astype(agg.dtype)[:, None]
            attended[name] = agg
        return attended, attention_maps


def visualize_attention(
    attention_weights, modality_names, save_path: Optional[str] = None
) -> None:
    """Modality x modality heatmap of batch/head-averaged attention
    (ref attention.py:551-602)."""
    import numpy as np

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return

    attn = np.asarray(attention_weights)
    while attn.ndim > 2:
        attn = attn.mean(axis=0)
    n = len(modality_names)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(attn, cmap="viridis")
    fig.colorbar(im, ax=ax)
    ax.set_xticks(range(n))
    ax.set_yticks(range(min(n, attn.shape[0])))
    ax.set_xticklabels(modality_names, rotation=45, ha="right")
    ax.set_yticklabels(modality_names[: attn.shape[0]])
    ax.set_xlabel("Key modality")
    ax.set_ylabel("Query modality")
    ax.set_title("Cross-modal attention")
    if n <= 8:
        for i in range(attn.shape[0]):
            for j in range(attn.shape[1]):
                ax.text(j, i, f"{attn[i, j]:.2f}", ha="center", va="center",
                        color="white", fontsize=8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150)
    plt.close(fig)
