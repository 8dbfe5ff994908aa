"""Checkpoint -> int8 serving-artifact CLI (weight-only PTQ).

    python -m multimodal_emotion_detection_tpu.tools.quantize \
        --checkpoint outputs/<run>/best.ckpt --out model_int8.msgpack \
        [overrides...]

Loads a training checkpoint, quantizes the parameters per output channel
to int8 (``utils/quantize.py``) and writes a msgpack serving artifact
~4x smaller than the f32 checkpoint.  Serve it with
``tools.predict --quantized-artifact model_int8.msgpack`` or load it
directly::

    params, meta = load_quantized("model_int8.msgpack", dtype)
    logits = make_forward_fn(model, M)(params, model_state, features)

The reference has no quantization/serving-artifact story (its inference
path is a Lightning test loop, SURVEY.md §3.3).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Quantize a checkpoint")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--out", default="model_int8.msgpack")
    parser.add_argument("--min-size", type=int, default=None,
                        help="smallest leaf (elements) to quantize "
                             "(default: utils.quantize.DEFAULT_MIN_SIZE)")
    parser.add_argument("overrides", nargs="*")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from multimodal_emotion_detection_tpu.config import load_config
    from multimodal_emotion_detection_tpu.utils.runtime import (
        setup_from_config,
    )

    config = load_config(args.config, args.overrides)
    config.model.frontend.cache = False
    setup_from_config(config)

    from multimodal_emotion_detection_tpu.tools._restore import (
        restore_for_eval,
    )
    from multimodal_emotion_detection_tpu.utils.quantize import (
        DEFAULT_MIN_SIZE,
        save_quantized,
    )

    _, state, meta, _ = restore_for_eval(config, args.checkpoint)

    min_size = DEFAULT_MIN_SIZE if args.min_size is None else args.min_size
    stats = save_quantized(args.out, state.params, meta=meta,
                           min_size=min_size)
    stats["compression"] = round(
        stats["bytes_f32"] / max(1, stats["bytes_quantized"]), 3)
    print(json.dumps(stats, indent=2))
    print(f"Wrote int8 serving artifact to {args.out}")
    return stats


if __name__ == "__main__":
    main(sys.argv[1:])
