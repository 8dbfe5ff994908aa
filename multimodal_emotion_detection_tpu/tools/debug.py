"""Debug harness: the four training-sanity probes of
/root/reference/src/debug.py, re-built on the functional engine.

    python -m multimodal_emotion_detection_tpu.tools.debug [overrides...]

1. label-distribution audit per split (ref debug.py:29-56);
2. head-only overfit-one-batch: freeze encoder params (optax mask), lr
   1e-2, dropout off, PASS if acc > 0.98 within <= 200 steps (ref :64-126);
3. encoder-output & fused-logit statistics (ref :134-177);
4. gradient-magnitude statistics from one backward pass (ref :185-225).
"""

from __future__ import annotations

import sys
from collections import Counter
from typing import Dict

import numpy as np


def inspect_label_distribution(loaders: Dict[str, object]) -> Dict[str, Dict]:
    out = {}
    for split, loader in loaders.items():
        counts = Counter(int(x) for x in loader.arrays.labels)
        total = sum(counts.values())
        dist = {k: counts[k] / total for k in sorted(counts)}
        print(f"[labels] {split}: n={total} dist=" + ", ".join(
            f"{k}:{v:.3f}" for k, v in dist.items()
        ))
        out[split] = dist
    return out


def overfit_one_batch(
    config, train_loader, max_steps: int = 200, lr: float = 1e-2,
    freeze_encoders: bool = True, target_acc: float = 0.98,
) -> bool:
    import copy

    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.steps import (
        create_train_state,
        make_train_step,
    )

    cfg = copy.deepcopy(config)
    cfg.model.dropout = 0.0
    for enc in cfg.model.encoders.values():
        enc["dropout"] = 0.0
    model = classifier_from_config(cfg)

    feats_all, labels_all = train_loader.device_arrays()
    b = min(train_loader.batch_size, train_loader.num_samples)
    idx = jnp.arange(b, dtype=jnp.int32)
    valid = jnp.ones((b,), jnp.float32)

    base_tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adam(lr)
    )
    if freeze_encoders:
        def label_fn(params):
            return {
                k: ("frozen" if k.endswith("_encoder") else "train")
                for k in params
            }

        tx = optax.multi_transform(
            {"train": base_tx, "frozen": optax.set_to_zero()}, label_fn
        )
    else:
        tx = base_tx

    sample = {m: jnp.take(a, idx, axis=0) for m, a in feats_all.items()}
    state = create_train_state(
        model, tx, sample, jnp.ones((b, len(feats_all)), jnp.float32),
        jax.random.PRNGKey(cfg.seed),
    )
    step = make_train_step(
        model, tx, num_modalities=len(feats_all), modality_dropout=0.0,
        has_batch_stats=bool(state.model_state),
    )
    key = jax.random.PRNGKey(0)
    acc = 0.0
    for i in range(max_steps):
        state, metrics = step(state, feats_all, labels_all, idx, valid, key)
        acc = float(metrics["acc"])
        if acc > target_acc:
            print(f"[overfit] PASS at step {i + 1}: acc={acc:.4f}")
            return True
    print(f"[overfit] FAIL after {max_steps} steps: acc={acc:.4f}")
    return False


def activation_stats(config, train_loader) -> Dict[str, Dict[str, float]]:
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )

    model = classifier_from_config(config)
    feats_all, labels_all = train_loader.device_arrays()
    b = min(train_loader.batch_size, train_loader.num_samples)
    batch = {m: a[:b] for m, a in feats_all.items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(config.seed), batch)
    logits, aux = model.apply(variables, batch, deterministic=True,
                              return_aux=True)
    stats = {}
    for name, tensor in {**aux["encoded"], "logits": logits}.items():
        arr = np.asarray(tensor)
        stats[name] = {
            "mean": float(arr.mean()), "std": float(arr.std()),
            "min": float(arr.min()), "max": float(arr.max()),
        }
        print(f"[activations] {name}: " + ", ".join(
            f"{k}={v:.4f}" for k, v in stats[name].items()
        ))
    return stats


def gradient_stats(config, train_loader) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )

    model = classifier_from_config(config)
    feats_all, labels_all = train_loader.device_arrays()
    b = min(train_loader.batch_size, train_loader.num_samples)
    batch = {m: a[:b] for m, a in feats_all.items()}
    labels = labels_all[:b]
    variables = dict(
        jax.jit(model.init)(jax.random.PRNGKey(config.seed), batch)
    )
    params = variables.pop("params")

    def loss_fn(p):
        out = model.apply(
            {"params": p, **variables}, batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=list(variables.keys()) or False,
        )
        logits = out[0] if variables else out
        if isinstance(logits, tuple):
            logits = logits[0]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    grads = jax.grad(loss_fn)(params)
    out = {}
    for top, sub in grads.items():
        leaves = jax.tree_util.tree_leaves(sub)
        norm = float(np.sqrt(sum(float((np.asarray(l) ** 2).sum())
                                 for l in leaves)))
        out[top] = norm
        print(f"[grads] {top}: global_norm={norm:.6f}")
    zero = [k for k, v in out.items() if v == 0.0]
    if zero:
        print(f"[grads] WARNING: zero gradients in {zero}")
    return out


def main(argv=None):
    from multimodal_emotion_detection_tpu.config import load_config
    from multimodal_emotion_detection_tpu.data.loader import create_dataloaders
    from multimodal_emotion_detection_tpu.utils.runtime import setup_from_config

    argv = list(sys.argv[1:] if argv is None else argv)
    config_path = None
    if argv and argv[0] == "--config":
        config_path = argv[1]
        argv = argv[2:]
    config = load_config(config_path, argv)
    # these tools feed RAW features to the model, so the frontend must run
    # in-graph even if the training run cached features per split (the
    # checkpoint is identical either way: the frontend has no parameters)
    config.model.frontend.cache = False
    setup_from_config(config)

    train_loader, val_loader, test_loader = create_dataloaders(
        dataset_name=config.dataset.name,
        data_dir=config.dataset.data_dir,
        modalities=config.dataset.modalities,
        batch_size=config.dataset.batch_size,
        modality_dropout=0.0,
        seed=config.seed,
        num_samples=config.dataset.num_samples,
        num_samples_eval=config.dataset.num_samples_eval,
        num_classes=config.dataset.num_classes,
        modality_dim=config.dataset.modality_dim,
        sequence_length=config.dataset.sequence_length,
    )
    print("=" * 60)
    inspect_label_distribution(
        {"train": train_loader, "val": val_loader, "test": test_loader}
    )
    print("=" * 60)
    ok = overfit_one_batch(config, train_loader)
    print("=" * 60)
    activation_stats(config, train_loader)
    print("=" * 60)
    gradient_stats(config, train_loader)
    print("=" * 60)
    print(f"debug harness complete; overfit_one_batch {'PASS' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    main()
