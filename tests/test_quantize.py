"""Weight-only int8 serving quantization (utils/quantize.py + CLIs).

The reference has no quantization story (SURVEY.md §3.3: its inference
path is a Lightning test loop); this is a framework addition for the
deployment path, so the tests pin OUR contract: per-channel error bound,
small-leaf passthrough, artifact roundtrip, and the predict CLI surface.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_emotion_detection_tpu.utils.quantize import (
    dequantize_tree,
    load_quantized,
    quantize_params_for_eval,
    quantize_tree,
    save_quantized,
)

from tests.test_train import tiny_config


def _params_tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dense": {"kernel": jax.random.normal(k1, (64, 48)),
                  "bias": jax.random.normal(k2, (48,))},
        "lstm": {"w_ih": 3.0 * jax.random.normal(k3, (32, 128))},
        "norm": {"scale": jnp.ones((48,))},
    }


def test_quantize_roundtrip_error_bound():
    params = _params_tree(jax.random.PRNGKey(0))
    qtree, stats = quantize_tree(params, min_size=1024)
    deq = dequantize_tree(qtree)

    # big 2D leaves: symmetric 127-level round-to-nearest per OUTPUT
    # channel (last axis) => |w - deq| <= max|w_channel| / 254
    for name in ("dense", "lstm"):
        for k, w in params[name].items():
            if np.asarray(w).size < 1024:
                continue
            w = np.asarray(w)
            d = np.asarray(deq[name][k])
            bound = np.max(np.abs(w), axis=0) / 254.0 + 1e-9
            assert np.all(np.abs(w - d) <= bound), (name, k)

    # small leaves (bias, norm scale) pass through bitwise
    np.testing.assert_array_equal(np.asarray(deq["dense"]["bias"]),
                                  np.asarray(params["dense"]["bias"]))
    np.testing.assert_array_equal(np.asarray(deq["norm"]["scale"]),
                                  np.asarray(params["norm"]["scale"]))

    # ~4x byte shrink on the quantized leaves
    assert stats["bytes_quantized"] < 0.45 * stats["bytes_f32"]


def test_quantize_bf16_leaves():
    """bfloat16 param leaves must quantize (ml_dtypes is not an
    np.floating subtype — the gate uses jnp.issubdtype), and the
    bytes_f32 stat reports the f32-EQUIVALENT size so the compression
    label stays honest for bf16 checkpoints."""
    w = jnp.asarray(np.linspace(-2, 2, 64 * 64).reshape(64, 64),
                    jnp.bfloat16)
    qtree, stats = quantize_tree({"k": w}, min_size=64)
    assert "::int8::" in qtree["k"], "bf16 leaf did not quantize"
    assert stats["bytes_f32"] == 64 * 64 * 4  # f32-equivalent, not nbytes
    deq = dequantize_tree(qtree)["k"]
    a = np.asarray(w, np.float32)
    bound = np.max(np.abs(a), axis=0) / 254.0 + 1e-9
    assert np.all(np.abs(a - np.asarray(deq)) <= bound)


def test_quantize_modes_and_artifact_roundtrip(tmp_path):
    params = _params_tree(jax.random.PRNGKey(1))

    # in-memory eval round-trip == explicit quantize+dequantize
    rt = quantize_params_for_eval(params, "int8")
    qtree, _ = quantize_tree(params)
    for a, b in zip(jax.tree_util.tree_leaves(rt),
                    jax.tree_util.tree_leaves(dequantize_tree(qtree))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # bf16 mode: plain cast
    bf = quantize_params_for_eval(params, "bfloat16")
    assert all(np.asarray(leaf).dtype == jnp.bfloat16
               for leaf in jax.tree_util.tree_leaves(bf))

    # artifact save/load == in-memory dequantization, meta preserved
    path = tmp_path / "model_int8.msgpack"
    stats = save_quantized(path, params, meta={"epoch": 3})
    loaded, meta = load_quantized(path)
    assert meta["epoch"] == 3
    assert stats["bytes_file"] < 0.5 * stats["bytes_f32"]
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(dequantize_tree(qtree))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_cli_quantized_paths(tmp_path, monkeypatch):
    """End-to-end serving quantization: train -> quantize CLI -> predict
    with --quantized-artifact, and the in-memory --quantize-weights path
    produces the SAME logits (both dequantize the same codes)."""
    monkeypatch.chdir(tmp_path)
    from multimodal_emotion_detection_tpu.tools.predict import (
        main as predict_main,
    )
    from multimodal_emotion_detection_tpu.tools.quantize import (
        main as quantize_main,
    )
    from multimodal_emotion_detection_tpu.train import run

    cfg = tiny_config()
    cfg.training.max_epochs = 1
    cfg.experiment.save_dir = str(tmp_path / "out")
    run(cfg)
    run_dir = tmp_path / "out" / cfg.experiment.name
    ckpt = str(run_dir / "best.ckpt")
    snap = str(run_dir / "config_snapshot" / "config.yaml")

    # tiny model: lower the quantization size floor so the 8x16 kernels
    # actually quantize (production default keeps small leaves f32)
    stats = quantize_main([
        "--checkpoint", ckpt, "--config", snap,
        "--out", str(tmp_path / "model_int8.msgpack"),
        "--min-size", "64",
    ])
    assert stats["compression"] > 1.5

    m_f32 = predict_main(["--checkpoint", ckpt, "--config", snap,
                          "--out", str(tmp_path / "p_f32")])
    m_mem = predict_main(["--checkpoint", ckpt, "--config", snap,
                          "--quantize-weights", "int8",
                          "--quantize-min-size", "64",
                          "--out", str(tmp_path / "p_mem")])
    m_art = predict_main(["--checkpoint", ckpt, "--config", snap,
                          "--quantized-artifact",
                          str(tmp_path / "model_int8.msgpack"),
                          "--out", str(tmp_path / "p_art")])
    assert m_mem["quantize_weights"] == "int8"
    assert m_art["quantize_weights"] == "int8-artifact"

    l_f32 = np.load(tmp_path / "p_f32" / "logits.npy")
    l_mem = np.load(tmp_path / "p_mem" / "logits.npy")
    l_art = np.load(tmp_path / "p_art" / "logits.npy")
    # artifact and in-memory paths dequantize identical codes
    np.testing.assert_array_equal(l_mem, l_art)
    # int8 weight noise must stay a small perturbation of the logits
    denom = max(1e-6, float(np.mean(np.abs(l_f32))))
    assert float(np.mean(np.abs(l_f32 - l_mem))) / denom < 0.08

    report = json.loads((tmp_path / "p_art" / "metrics.json").read_text())
    assert report["quantize_weights"] == "int8-artifact"
