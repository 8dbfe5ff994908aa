"""Import reference (torch/Lightning) checkpoints into this framework.

The reference saves Lightning checkpoints whose ``state_dict`` keys follow
its LightningModule attribute layout (/root/reference/src/train.py:50-85):

    encoders.audio.rnn.weight_ih_l{k} / weight_hh_l{k} / bias_*_l{k}
    encoders.audio.projection.{weight,bias}
    encoders.video.frame_mlp.0.{weight,bias}      # Linear
    encoders.video.attention.{weight,bias}        # attention-pool score
    encoders.video.projection.0.{weight,bias}     # LayerNorm
    encoders.video.projection.1.{weight,bias}     # Linear
    fusion_head.0.{weight,bias} / fusion_head.2.{weight,bias}

``import_reference_state_dict`` maps those tensors onto this framework's
parameter tree for the flagship configuration (LSTM/GRU audio sequence
encoder + frame video encoder + concat head, ``train_fusion='concat'``),
transposing Linear weights (torch stores (out, in)) and summing torch's
two RNN bias vectors into the single fused bias.  Migrating a *trained*
reference model therefore requires no retraining.

Verified by test against a torch model with the same wiring
(tests/test_torch_import.py): imported parameters reproduce the torch
logits to float32 tolerance.
"""

from __future__ import annotations

import copy
from typing import Any, Dict


def _t(tensor):
    import numpy as np

    arr = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
    return np.asarray(arr)


def load_lightning_state_dict(
    ckpt_path: str, allow_pickle: bool = False
) -> Dict[str, Any]:
    """Read a Lightning ``.ckpt`` (or raw state_dict file) with torch.

    Loads with ``weights_only=True`` (tensor-only deserialisation, no
    arbitrary pickled code).  Some older Lightning checkpoints embed
    non-tensor objects (callbacks, hparams namespaces) that require full
    unpickling; pass ``allow_pickle=True`` ONLY for checkpoints you trust —
    full unpickling executes arbitrary code from the file.
    """
    import torch

    try:
        obj = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise ValueError(
                f"{ckpt_path} is not loadable as a weights-only checkpoint. "
                "If you trust its origin, retry with allow_pickle=True "
                "(full unpickling can execute code embedded in the file)."
            )
        obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj


def import_reference_state_dict(
    state_dict: Dict[str, Any],
    template_params: Dict[str, Any],
    modalities=("audio", "video"),
    template_batch_stats: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    """Map a reference state_dict onto a template parameter tree.

    ``template_params`` is ``model.init(...)['params']`` of a
    MultimodalClassifier built with the matching configuration; returned
    tree has the same structure with imported values.

    Pass ``template_batch_stats`` (``model.init(...)['batch_stats']``)
    when the model has BatchNorm (cnn/mlp encoders): the reference's
    running_mean/running_var are then imported too and the call returns
    ``(params, batch_stats)`` — without them, eval-mode forwards would
    normalize with the init statistics instead of the trained ones.
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    params = copy.deepcopy(
        template_params if isinstance(template_params, dict)
        else dict(template_params)
    )
    batch_stats = (
        copy.deepcopy(dict(template_batch_stats))
        if template_batch_stats is not None else None
    )

    def linear(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def layernorm(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    for modality in modalities:
        enc_key = f"{modality}_encoder"
        if enc_key not in params:
            continue
        enc = params[enc_key]
        base = f"encoders.{modality}"

        if f"{base}.rnn.weight_ih_l0" in sd:  # SequenceEncoder lstm/gru
            layer = 0
            while f"{base}.rnn.weight_ih_l{layer}" in sd:
                node = enc["rnn"][f"layer_{layer}"]
                node["w_ih"] = sd[f"{base}.rnn.weight_ih_l{layer}"].T
                node["w_hh"] = sd[f"{base}.rnn.weight_hh_l{layer}"].T
                b_ih = sd[f"{base}.rnn.bias_ih_l{layer}"]
                b_hh = sd[f"{base}.rnn.bias_hh_l{layer}"]
                if "b" in node:  # LSTM: fused bias
                    node["b"] = b_ih + b_hh
                else:  # GRU keeps both (reset gate is applied inside)
                    node["b_ih"] = b_ih
                    node["b_hh"] = b_hh
                layer += 1
            enc["projection"] = linear(f"{base}.projection")

        elif f"{base}.conv1.weight" in sd:  # SequenceEncoder cnn (:79-94)
            for conv in ("conv1", "conv2"):
                # torch Conv1d (C_out, C_in, K) -> flax Conv (K, C_in, C_out)
                enc[conv] = {
                    "kernel": sd[f"{base}.{conv}.weight"].transpose(2, 1, 0),
                    "bias": sd[f"{base}.{conv}.bias"],
                }
            for bn in ("bn1", "bn2"):
                enc[bn] = {
                    "scale": sd[f"{base}.{bn}.weight"],
                    "bias": sd[f"{base}.{bn}.bias"],
                }
                if batch_stats is not None and enc_key in batch_stats:
                    batch_stats[enc_key][bn] = {
                        "mean": sd[f"{base}.{bn}.running_mean"],
                        "var": sd[f"{base}.{bn}.running_var"],
                    }
            enc["projection"] = linear(f"{base}.projection")

        elif f"{base}.input_proj.weight" in sd:  # SequenceEncoder transformer
            enc["input_proj"] = linear(f"{base}.input_proj")
            enc["pos_embedding"] = {
                "embedding": sd[f"{base}.pos_embedding.weight"]
            }
            i = 0
            while (
                f"{base}.transformer.layers.{i}.self_attn.in_proj_weight"
                in sd
            ):
                lyr = f"{base}.transformer.layers.{i}"
                blk = enc[f"block_{i}"]
                # template tells us the head split: kernel (E, nH, hd)
                e, heads, hd = blk["self_attn"]["query"]["kernel"].shape
                w_in = sd[f"{lyr}.self_attn.in_proj_weight"]  # (3E, E)
                b_in = sd[f"{lyr}.self_attn.in_proj_bias"]
                for j, name in enumerate(("query", "key", "value")):
                    blk["self_attn"][name] = {
                        "kernel": w_in[j * e:(j + 1) * e].T.reshape(
                            e, heads, hd
                        ),
                        "bias": b_in[j * e:(j + 1) * e].reshape(heads, hd),
                    }
                blk["self_attn"]["out"] = {
                    "kernel": sd[f"{lyr}.self_attn.out_proj.weight"].T.reshape(
                        heads, hd, e
                    ),
                    "bias": sd[f"{lyr}.self_attn.out_proj.bias"],
                }
                blk["ln1"] = layernorm(f"{lyr}.norm1")
                blk["ln2"] = layernorm(f"{lyr}.norm2")
                blk["ffn_in"] = linear(f"{lyr}.linear1")
                blk["ffn_out"] = linear(f"{lyr}.linear2")
                i += 1
            enc["projection"] = linear(f"{base}.projection")

        elif f"{base}.frame_mlp.0.weight" in sd:  # FrameEncoder
            enc["frame_mlp"] = linear(f"{base}.frame_mlp.0")
            if f"{base}.attention.weight" in sd:
                enc["pool"]["attention"] = linear(f"{base}.attention")
            enc["proj_ln"] = layernorm(f"{base}.projection.0")
            enc["projection"] = linear(f"{base}.projection.1")

    if "fusion_head.0.weight" in sd:  # concat head (ref train.py:81-85)
        params["head_in"] = linear("fusion_head.0")
        params["head_out"] = linear("fusion_head.2")
    if batch_stats is not None:
        return params, batch_stats
    return params


def import_reference_checkpoint(
    ckpt_path: str,
    template_params: Dict[str, Any],
    modalities=("audio", "video"),
    template_batch_stats: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    return import_reference_state_dict(
        load_lightning_state_dict(ckpt_path), template_params, modalities,
        template_batch_stats=template_batch_stats,
    )
