"""Ahead-of-time model export for serving (jax.export / StableHLO).

    python -m multimodal_emotion_detection_tpu.tools.export \
        --checkpoint outputs/<run>/best.ckpt --out model.stablehlo \
        [--batch 32] [overrides...]

Serializes the jitted inference forward (params baked in) to portable
StableHLO bytes: the serving artifact runs without the Python model code —
`jax.export.deserialize(...).call(features...)` is the whole server.  The
reference has no serving/export story at all (its inference path is a
Lightning test loop, SURVEY.md §3.3).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def export_model(
    config, checkpoint: str, batch_size: int, out_path: str
) -> Path:
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.data.loader import create_dataloaders
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.checkpoints import (
        restore_checkpoint,
    )
    from multimodal_emotion_detection_tpu.training.optim import build_optimizer
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
    )

    loaders = create_dataloaders(
        dataset_name=config.dataset.name,
        data_dir=config.dataset.data_dir,
        modalities=config.dataset.modalities,
        batch_size=batch_size,
        seed=config.seed,
        num_samples=config.dataset.num_samples,
        num_samples_eval=config.dataset.num_samples_eval,
        num_classes=config.dataset.num_classes,
        modality_dim=config.dataset.modality_dim,
        sequence_length=config.dataset.sequence_length,
    )
    loader = loaders[2]
    model = classifier_from_config(config)
    tx, _ = build_optimizer(config.training, steps_per_epoch=1)
    feats_all, _ = loader.device_arrays()
    batch_size = min(batch_size, loader.num_samples)
    sample = {m: a[:batch_size] for m, a in feats_all.items()}
    template = create_train_state(
        model, tx, sample,
        jnp.ones((batch_size, loader.arrays.num_modalities), jnp.float32),
        jax.random.PRNGKey(config.seed),
    )
    state, _ = restore_checkpoint(Path(checkpoint), template)

    params = jax.device_get(state.params)
    model_state = jax.device_get(state.model_state)

    def serve(features):
        out = model.apply(
            {"params": params, **model_state}, features, deterministic=True
        )
        return out[0] if isinstance(out, tuple) else out

    shapes = {
        m: jax.ShapeDtypeStruct((batch_size,) + a.shape[1:], a.dtype)
        for m, a in sample.items()
    }
    exported = jax.export.export(jax.jit(serve))(shapes)
    blob = exported.serialize()
    out = Path(out_path)
    out.write_bytes(blob)
    print(f"Exported {len(blob):,} bytes of StableHLO to {out}")

    # round-trip sanity: deserialize and run on the sample batch
    restored = jax.export.deserialize(out.read_bytes())
    ref = serve(sample)
    got = restored.call(sample)
    import numpy as np

    ref_np, got_np = np.asarray(ref), np.asarray(got)
    err = float(np.abs(ref_np - got_np).max())
    rel = err / max(float(np.abs(ref_np).max()), 1e-12)
    print(f"Round-trip check: max |Δlogits| = {err:.2e} (rel {rel:.2e})")
    # The deserialized program is re-compiled; under reduced-precision
    # compute the new fusion/tiling choices round differently (same
    # spread family as docs/KERNELS.md's numerics note), so the gate is
    # RELATIVE and scaled to the dtype's rounding envelope: f32 keeps the
    # tight bound; bf16's ~8e-3 per-op epsilon compounds to ~1e-2 across
    # a few layers (measured 3e-3 rel on the demo model).
    tol = 1e-5 if config.runtime.compute_dtype == "float32" else 1.5e-2
    assert rel < tol, (
        f"exported model diverges from the live model (rel {rel:.2e} >= "
        f"{tol})"
    )
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="AOT export for serving")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--out", default="model.stablehlo")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from multimodal_emotion_detection_tpu.config import load_config
    from multimodal_emotion_detection_tpu.utils.runtime import setup_from_config

    config = load_config(args.config, args.overrides)
    # these tools feed RAW features to the model, so the frontend must run
    # in-graph even if the training run cached features per split (the
    # checkpoint is identical either way: the frontend has no parameters)
    config.model.frontend.cache = False
    setup_from_config(config)
    return export_model(config, args.checkpoint, args.batch, args.out)


if __name__ == "__main__":
    main(sys.argv[1:])
