"""Compact ResNet backbones (flax.linen) for the pretrained-CNN encoder slot.

The reference wraps torchvision resnet18/34/50 with fc->Identity
(/root/reference/src/encoders.py:424-438).  This is a from-scratch flax
implementation of the same topologies.  Pretrained ImageNet weights cannot
be downloaded in this environment (zero egress); ``load_torch_resnet_weights``
converts a locally-available torchvision ``state_dict`` file if the user has
one, otherwise the backbone trains from random init.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=deterministic,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=deterministic,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


_VARIANTS: Dict[str, tuple] = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
}


class ResNet(nn.Module):
    """(B, H, W, C) -> (B, feat_dim) global-average-pooled features."""

    variant: str = "resnet18"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 bn_eval=None) -> jnp.ndarray:
        # Blocks contain only BN (no dropout), so their `deterministic` IS
        # the BN mode; bn_eval overrides it for MC-dropout-style eval.
        bn_ra = deterministic if bn_eval is None else bn_eval
        block_cls, stage_sizes = _VARIANTS[self.variant]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        y = nn.BatchNorm(use_running_average=bn_ra, dtype=self.dtype,
                         name="stem_bn")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, num_blocks in enumerate(stage_sizes):
            features = 64 * (2 ** stage)
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                y = block_cls(features=features, strides=strides, dtype=self.dtype,
                              name=f"stage{stage}_block{block}")(
                    y, deterministic=bn_ra
                )
        return y.mean(axis=(1, 2))  # global average pool -> (B, feat)


def feature_dim(variant: str) -> int:
    block_cls, _ = _VARIANTS[variant]
    return 512 * (4 if block_cls is Bottleneck else 1)


def load_torch_resnet_weights(
    params: Dict[str, Any], state_dict_path: str, variant: str = "resnet18"
) -> Dict[str, Any]:
    """Convert a locally-saved torchvision resnet state_dict into this
    module's parameter tree (conv HWIO transpose, BN scale/bias/stats).

    Only usable when a checkpoint file exists locally; no downloads.
    """
    from collections.abc import Mapping

    import numpy as np

    if isinstance(state_dict_path, Mapping):
        sd = dict(state_dict_path)  # a state_dict was passed directly
    else:
        import torch

        sd = torch.load(state_dict_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()

    def conv(name):
        return np.transpose(sd[name].numpy(), (2, 3, 1, 0))  # OIHW -> HWIO

    def bn(prefix):
        return {
            "scale": sd[f"{prefix}.weight"].numpy(),
            "bias": sd[f"{prefix}.bias"].numpy(),
        }, {
            "mean": sd[f"{prefix}.running_mean"].numpy(),
            "var": sd[f"{prefix}.running_var"].numpy(),
        }

    import copy

    new_params = copy.deepcopy(
        params if isinstance(params, dict) else params.unfreeze()
    )
    p = new_params["params"]
    stats = new_params.setdefault("batch_stats", {})

    p["stem_conv"] = {"kernel": conv("conv1.weight")}
    bn_p, bn_s = bn("bn1")
    p["stem_bn"] = bn_p
    stats["stem_bn"] = bn_s

    _, stage_sizes = _VARIANTS[variant]
    is_bottleneck = _VARIANTS[variant][0] is Bottleneck
    n_convs = 3 if is_bottleneck else 2
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            t_prefix = f"layer{stage + 1}.{block}"
            f_prefix = f"stage{stage}_block{block}"
            node = p.setdefault(f_prefix, {})
            node_s = stats.setdefault(f_prefix, {})
            for ci in range(1, n_convs + 1):
                node[f"conv{ci}"] = {"kernel": conv(f"{t_prefix}.conv{ci}.weight")}
                bn_p, bn_s = bn(f"{t_prefix}.bn{ci}")
                node[f"bn{ci}"] = bn_p
                node_s[f"bn{ci}"] = bn_s
            if f"{t_prefix}.downsample.0.weight" in sd:
                node["downsample_conv"] = {
                    "kernel": conv(f"{t_prefix}.downsample.0.weight")
                }
                bn_p, bn_s = bn(f"{t_prefix}.downsample.1")
                node["downsample_bn"] = bn_p
                node_s["downsample_bn"] = bn_s
    return new_params
