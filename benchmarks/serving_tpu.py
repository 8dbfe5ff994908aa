"""Serving-path benchmark: forward-only clips/s on the flagship model.

Measures the jitted inference forward (make_forward_fn) with the scan
recurrence vs the Pallas in-kernel recurrence, plus vmapped MC-dropout
throughput. One-shot, exit-clean; writes benchmarks/serving_tpu.json.
"""
import json, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

OUT = Path(__file__).parent / "serving_tpu.json"


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.models.classifier import (
        classifier_from_config,
    )
    from multimodal_emotion_detection_tpu.training.steps import make_forward_fn
    from multimodal_emotion_detection_tpu.uncertainty.mc_dropout import (
        mc_dropout_predict,
    )

    results = {"platform": jax.default_backend()}
    batch = 32
    rng = np.random.RandomState(0)
    features = {
        "audio": jnp.asarray(rng.randn(batch, 48000, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(batch, 24, 4096).astype(np.float32)),
    }

    def build(kernel: bool):
        cfg = Config()
        apply_overrides(cfg, [
            f"dataset.batch_size={batch}",
            "model.encoders.video.input_dim=4096",
            f"model.encoders.audio.inference_kernel={'true' if kernel else 'false'}",
        ])
        cfg.model.frontend.audio = "logmel"
        model = classifier_from_config(cfg)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), features)
        params = dict(variables).pop("params")
        fwd = make_forward_fn(model, 2)
        return model, params, fwd

    def timeit(fn, iters=100):
        np.asarray(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out)
        return batch * iters / (time.perf_counter() - t0)

    model, params, fwd = build(kernel=False)
    results["forward_scan_clips_per_sec"] = round(
        timeit(lambda: fwd(params, {}, features)), 1
    )
    OUT.write_text(json.dumps(results, indent=2))

    model_k, params_k, fwd_k = build(kernel=True)
    results["forward_kernel_clips_per_sec"] = round(
        timeit(lambda: fwd_k(params_k, {}, features)), 1
    )
    OUT.write_text(json.dumps(results, indent=2))

    # batched throughput serving: S=8 microbatches in ONE dispatch
    # (make_batched_forward_fn; the per-dispatch forward above is ~50%
    # host dispatch at b32)
    from multimodal_emotion_detection_tpu.training.steps import (
        make_batched_forward_fn,
    )

    S = 8
    feats_many = {
        m: jnp.broadcast_to(a[None], (S,) + a.shape) for m, a in features.items()
    }
    for tag, (p, m_) in (("scan", (params, model)),
                         ("kernel", (params_k, model_k))):
        fwd_many = make_batched_forward_fn(m_, 2)

        def many():
            return fwd_many(p, {}, feats_many)

        np.asarray(many())
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            out = many()
        np.asarray(out)
        results[f"forward_batched_{tag}_clips_per_sec"] = round(
            S * batch * iters / (time.perf_counter() - t0), 1
        )
        OUT.write_text(json.dumps(results, indent=2))

    # batched serving at b256 (throughput point)
    feats256 = {
        m: jnp.broadcast_to(
            jnp.concatenate([a] * 8, axis=0)[None], (4, 256) + a.shape[1:]
        )
        for m, a in features.items()
    }
    fwd_many256 = make_batched_forward_fn(model, 2)

    def many256():
        return fwd_many256(params, {}, feats256)

    np.asarray(many256())
    t0 = time.perf_counter()
    for _ in range(10):
        out = many256()
    np.asarray(out)
    results["forward_batched_b256_clips_per_sec"] = round(
        4 * 256 * 10 / (time.perf_counter() - t0), 1
    )
    OUT.write_text(json.dumps(results, indent=2))

    # vmapped MC dropout (S=10): one program, S x batch
    def mc():
        logits, unc = mc_dropout_predict(
            model, params, {}, features, num_samples=10,
            key=jax.random.PRNGKey(1),
        )
        return unc

    results["mc_dropout10_clips_per_sec"] = round(timeit(mc, iters=20), 1)
    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
