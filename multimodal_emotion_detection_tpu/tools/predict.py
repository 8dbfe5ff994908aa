"""Inference / robustness-evaluation CLI (the serving path).

    python -m multimodal_emotion_detection_tpu.tools.predict \
        --checkpoint outputs/<run>/best.ckpt [--split test] \
        [--mc-dropout 10] [--missing keep_idx,keep_idx] [--out preds/] \
        [overrides...]

Loads a checkpoint, runs the jitted inference forward over a split
(SURVEY.md §3.3's serving path) and writes ``logits.npy`` /
``predictions.npy`` / ``metrics.json``.  Options:

* ``--mc-dropout S``: vmapped MC-dropout — also writes ``uncertainty.npy``
  (the reference's MCDropoutUncertainty wrapper, uncertainty.py:17-86,
  which its training entry never invokes; here it is a first-class eval).
* ``--missing i[,j]``: keep only the listed modality indices — the
  missing-modality robustness evaluation the reference ships as an unused
  utility (/root/reference/src/data.py:297-327).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Inference / robustness eval")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--split", default="test",
                        choices=["train", "val", "test"])
    parser.add_argument("--mc-dropout", type=int, default=0)
    parser.add_argument("--missing", default=None,
                        help="comma-separated modality indices to KEEP")
    parser.add_argument("--quantize-weights", default="none",
                        choices=["none", "int8", "int8-bf16", "bfloat16"],
                        help="round-trip params through the serving "
                             "quantization before eval (accuracy A/B)")
    parser.add_argument("--quantize-min-size", type=int, default=None,
                        help="smallest leaf (elements) to quantize")
    parser.add_argument("--quantized-artifact", default=None,
                        help="load params from a tools.quantize artifact "
                             "instead of the checkpoint's params")
    parser.add_argument("--out", default="./predictions")
    parser.add_argument("overrides", nargs="*")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from multimodal_emotion_detection_tpu.config import load_config
    from multimodal_emotion_detection_tpu.utils.runtime import setup_from_config

    config = load_config(args.config, args.overrides)
    # these tools feed RAW features to the model, so the frontend must run
    # in-graph even if the training run cached features per split (the
    # checkpoint is identical either way: the frontend has no parameters)
    config.model.frontend.cache = False
    setup_from_config(config)

    import jax

    from multimodal_emotion_detection_tpu.data.masking import (
        simulate_missing_modalities,
    )
    from multimodal_emotion_detection_tpu.tools._restore import (
        restore_for_eval,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        make_forward_fn,
    )
    from multimodal_emotion_detection_tpu.uncertainty.calibration import (
        compute_calibration_metrics,
    )
    from multimodal_emotion_detection_tpu.uncertainty.mc_dropout import (
        mc_dropout_predict,
    )

    model, state, meta, loaders = restore_for_eval(
        config, args.checkpoint, split=args.split)
    loader = loaders[args.split]
    print(f"Restored {args.checkpoint} (meta: {meta})")

    if args.quantized_artifact is not None:
        from multimodal_emotion_detection_tpu.utils.quantize import (
            load_quantized,
        )

        qparams, qmeta = load_quantized(args.quantized_artifact)
        state = state.replace(params=qparams)
        print(f"Loaded int8 serving artifact {args.quantized_artifact} "
              f"(meta: {qmeta})")
    elif args.quantize_weights != "none":
        from multimodal_emotion_detection_tpu.utils.quantize import (
            DEFAULT_MIN_SIZE,
            quantize_params_for_eval,
        )

        state = state.replace(
            params=quantize_params_for_eval(
                state.params, args.quantize_weights,
                min_size=(DEFAULT_MIN_SIZE if args.quantize_min_size is None
                          else args.quantize_min_size)))
        print(f"Quantized weights in-memory: {args.quantize_weights}")

    forward = make_forward_fn(model, loader.arrays.num_modalities)
    keep = (
        [int(i) for i in args.missing.split(",")]
        if args.missing is not None else None
    )

    logits_list, labels_list, unc_list = [], [], []
    key = jax.random.PRNGKey(config.seed)
    for features, labels, mask in loader:
        if keep is not None:
            features, mask = simulate_missing_modalities(features, mask, keep)
        if args.mc_dropout > 0:
            logits, unc = mc_dropout_predict(
                model, state.params, state.model_state, features,
                num_samples=args.mc_dropout, key=key, mask=mask,
            )
            unc_list.append(np.asarray(unc))
        else:
            logits = forward(state.params, state.model_state, features, mask)
        logits_list.append(np.asarray(logits))
        labels_list.append(np.asarray(labels))

    logits = np.concatenate(logits_list)[: loader.num_samples]
    labels = np.concatenate(labels_list)[: loader.num_samples]
    preds = logits.argmax(-1)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "logits.npy", logits)
    np.save(out_dir / "predictions.npy", preds)
    np.save(out_dir / "labels.npy", labels)
    if unc_list:
        np.save(out_dir / "uncertainty.npy",
                np.concatenate(unc_list)[: loader.num_samples])

    metrics = compute_calibration_metrics(
        logits, labels, config.evaluation.num_calibration_bins
    )
    metrics["split"] = args.split
    metrics["missing_pattern"] = keep
    metrics["mc_dropout_samples"] = args.mc_dropout
    metrics["quantize_weights"] = (
        "int8-artifact" if args.quantized_artifact is not None
        else args.quantize_weights
    )
    (out_dir / "metrics.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics, indent=2))
    print(f"Wrote predictions to {out_dir}")
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
