"""r4e: FULL 3x2x2 grid as stacked vmapped programs, A/B'd on chip.

Round-4 verdict item 8: tools/sweep.py --vmap-lrs covered the lr axis;
vmapped_grid_sweep now stacks lr x modality-dropout as TRACED member
axes (6 members per program) with the static model-dropout axis as a
2-program loop.  This probe runs the full grid on the real chip against
a sequential baseline of 12 single-member programs built with the SAME
math and the SAME per-member init keys (member_ids), so per-tag results
are directly comparable, and banks the wall-clock ratio.

Geometry: flagship-class synthetic data (T=372 log-mel-shaped frames),
2-layer LSTM h256 audio encoder + frame video encoder, b32 f32, the
reference grid axes (3 lrs x 2 dropouts x 2 modality-dropouts), 8
epochs per member.

Writes r4e_tpu.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4e_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {str(value)[:200]}", flush=True)


def watchdog(seconds=3300):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def make_loaders():
    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader
    from multimodal_emotion_detection_tpu.data.synthetic import (
        synthetic_arrays,
    )

    train = synthetic_arrays(256, 8, {"audio": 64, "video": 4096},
                             372, "train", seed=1)
    train.features["video"] = train.features["video"][:, :24, :]
    val = synthetic_arrays(64, 8, {"audio": 64, "video": 4096},
                           372, "val", seed=1)
    val.features["video"] = val.features["video"][:, :24, :]
    return (MultimodalLoader(train, batch_size=32, shuffle=True, seed=3),
            MultimodalLoader(val, batch_size=32, shuffle=False, seed=3))


def model_factory(model_dropout):
    from multimodal_emotion_detection_tpu.models.classifier import (
        MultimodalClassifier,
    )

    return MultimodalClassifier(
        modalities=("audio", "video"),
        encoder_configs={
            "audio": {"type": "sequence", "encoder_type": "lstm",
                      "input_dim": 64, "hidden_dim": 256, "num_layers": 2,
                      "dropout": model_dropout},
            "video": {"type": "frame", "input_dim": 4096,
                      "hidden_dim": 256, "dropout": model_dropout},
        },
        num_classes=8, output_dim=128, hidden_dim=256,
        dropout=model_dropout, use_modality_mask=True,
    )


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax

    from multimodal_emotion_detection_tpu.parallel.vmap_sweep import (
        _vmapped_grid_members,
        vmapped_grid_sweep,
    )
    from multimodal_emotion_detection_tpu.tools.sweep import format_tag

    watchdog()
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    train, val = make_loaders()
    LRS = [5e-4, 1e-3, 2e-3]
    DROPS = [0.0, 0.1]
    MDROPS = [0.0, 0.05]
    EPOCHS = 8

    # ---- stacked: 2 programs x 6 traced members ----
    t0 = time.perf_counter()
    stacked = vmapped_grid_sweep(
        model_factory, train, val, lrs=LRS, model_dropouts=DROPS,
        modality_dropouts=MDROPS, epochs=EPOCHS, seed=5,
    )
    stacked_s = time.perf_counter() - t0
    flush("stacked_wall_s", round(stacked_s, 2))
    for r in stacked:
        r["tag"] = format_tag(r["learning_rate"], r["model_dropout"],
                              r["modality_dropout"])
    flush("stacked_results",
          {r["tag"]: round(r["best_val_loss"], 6) for r in stacked})

    # ---- sequential: 12 single-member programs, same init keys ----
    from multimodal_emotion_detection_tpu.models.recurrent import (
        set_infer_kernel_enabled,
    )
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        set_bwd_kernel_mode,
        set_fwd_kernel_mode,
    )

    prev_f, prev_b = set_fwd_kernel_mode("off"), set_bwd_kernel_mode("off")
    prev_i = set_infer_kernel_enabled(False)
    seq_results = {}
    t0 = time.perf_counter()
    try:
        for drop in DROPS:
            model = model_factory(drop)
            members = [(lr, md) for lr in LRS for md in MDROPS]
            for i, (lr, md) in enumerate(members):
                res = _vmapped_grid_members(
                    model, train, val, [(lr, md)], EPOCHS,
                    clip_norm=1.0, weight_decay=1e-4, seed=5,
                    member_ids=[i],
                )
                seq_results[format_tag(lr, drop, md)] = round(
                    res[0]["best_val_loss"], 6)
    finally:
        set_fwd_kernel_mode(prev_f)
        set_bwd_kernel_mode(prev_b)
        set_infer_kernel_enabled(prev_i)
    seq_s = time.perf_counter() - t0
    flush("sequential_wall_s", round(seq_s, 2))
    flush("sequential_results", seq_results)

    # per-tag equality (same member math, same init keys, same shared
    # batch/dropout keys; fp noise only)
    max_rel = 0.0
    for r in stacked:
        a = r["best_val_loss"]
        b = seq_results[r["tag"]]
        max_rel = max(max_rel, abs(a - b) / max(abs(b), 1e-9))
    flush("per_tag_max_rel_diff", round(max_rel, 8))
    flush("per_tag_equal_1e-4", bool(max_rel < 1e-4))
    flush("wall_clock_ratio_seq_over_stacked", round(seq_s / stacked_s, 3))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
