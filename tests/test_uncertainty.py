"""Uncertainty tooling: calibration math, MC dropout, temperature, ensemble."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_emotion_detection_tpu.models import MultimodalClassifier
from multimodal_emotion_detection_tpu.uncertainty import (
    CalibrationMetrics,
    TemperatureScaling,
    compute_calibration_metrics,
    ensemble_predict,
    mc_dropout_predict,
    per_bin_accuracy,
)
from multimodal_emotion_detection_tpu.uncertainty.ensemble import stack_params

KEY = jax.random.PRNGKey(0)


def test_ece_perfect_and_worst():
    # predictions always correct with conf 1.0 -> ECE 0
    conf = np.ones(100)
    preds = np.zeros(100)
    labels = np.zeros(100)
    assert CalibrationMetrics.expected_calibration_error(
        conf, preds, labels
    ) == pytest.approx(0.0)
    # always wrong with conf 1.0 -> ECE 1
    labels_bad = np.ones(100)
    assert CalibrationMetrics.expected_calibration_error(
        conf, preds, labels_bad
    ) == pytest.approx(1.0)


def test_ece_hand_computed():
    conf = np.array([0.95, 0.95, 0.55, 0.55])
    preds = np.array([0, 0, 1, 1])
    labels = np.array([0, 1, 1, 0])  # acc 0.5 in each bin
    # bins (10): [0.5,0.6) has conf .55 acc .5 -> gap .05; [0.9,1.0] gap .45
    ece = CalibrationMetrics.expected_calibration_error(
        conf, preds, labels, num_bins=10
    )
    assert ece == pytest.approx(0.5 * 0.05 + 0.5 * 0.45, abs=1e-6)
    mce = CalibrationMetrics.maximum_calibration_error(
        conf, preds, labels, num_bins=10
    )
    assert mce == pytest.approx(0.45, abs=1e-6)


def test_nll_matches_manual():
    logits = np.array([[2.0, 0.0], [0.0, 2.0]])
    labels = np.array([0, 0])
    p0 = np.exp(2) / (np.exp(2) + 1)
    p1 = 1 / (1 + np.exp(2))
    expected = -(np.log(p0) + np.log(p1)) / 2
    assert CalibrationMetrics.negative_log_likelihood(
        logits, labels
    ) == pytest.approx(expected, rel=1e-6)


def test_per_bin_accuracy_format():
    conf = np.array([0.05, 0.95])
    preds = np.array([0, 0])
    labels = np.array([0, 1])
    bins, accs = per_bin_accuracy(conf, preds, labels, num_bins=10)
    assert bins == [round(0.1 * (i + 1), 2) for i in range(10)]
    assert accs[0] == 1.0 and accs[9] == 0.0
    assert all(a is None for a in accs[1:9])


def test_compute_calibration_metrics_keys():
    rng = np.random.RandomState(0)
    logits = rng.randn(50, 4)
    labels = rng.randint(0, 4, 50)
    out = compute_calibration_metrics(logits, labels, num_bins=10)
    assert set(out) == {"ece", "mce", "nll", "accuracy"}
    assert 0 <= out["ece"] <= 1 and out["nll"] > 0


def test_reliability_diagram_writes(tmp_path):
    rng = np.random.RandomState(0)
    conf = rng.rand(100)
    preds = rng.randint(0, 2, 100)
    labels = rng.randint(0, 2, 100)
    path = tmp_path / "nested" / "dir" / "diagram.png"  # must mkdir itself
    CalibrationMetrics.reliability_diagram(conf, preds, labels,
                                           save_path=str(path))
    assert path.exists()


def test_temperature_scaling_reduces_nll():
    rng = np.random.RandomState(0)
    n, c = 400, 5
    true_logits = rng.randn(n, c)
    labels = np.array([np.argmax(l) if rng.rand() < 0.6 else rng.randint(c)
                       for l in true_logits])
    overconfident = true_logits * 6.0  # badly miscalibrated
    ts = TemperatureScaling()
    t = ts.calibrate(jnp.asarray(overconfident), jnp.asarray(labels))
    assert t > 1.5  # must cool the overconfident logits
    nll_before = CalibrationMetrics.negative_log_likelihood(
        overconfident, labels
    )
    nll_after = CalibrationMetrics.negative_log_likelihood(
        np.asarray(ts(jnp.asarray(overconfident))), labels
    )
    assert nll_after < nll_before


def _tiny_model_and_params(dropout=0.4):
    enc_cfg = {
        "a": {"type": "mlp", "input_dim": 8, "hidden_dim": 16,
              "num_layers": 1, "batch_norm": False, "dropout": dropout},
    }
    model = MultimodalClassifier(
        modalities=("a",), encoder_configs=enc_cfg, num_classes=4,
        output_dim=8, hidden_dim=16, dropout=dropout,
    )
    feats = {"a": jax.random.normal(KEY, (6, 8))}
    variables = jax.jit(lambda k: model.init(k, feats))(KEY)
    return model, dict(variables), feats


def test_mc_dropout_shapes_and_variance():
    model, variables, feats = _tiny_model_and_params(dropout=0.4)
    params = variables.pop("params")
    mean_logits, unc = mc_dropout_predict(
        model, params, variables, feats, num_samples=8, key=KEY
    )
    assert mean_logits.shape == (6, 4)
    assert unc.shape == (6,)
    assert float(unc.min()) >= 0.0
    assert float(unc.max()) > 0.0  # dropout active -> nonzero variance


def test_mc_dropout_respects_modality_mask():
    """The availability mask flows through mc_dropout_predict into the
    model (regression: predict.py --missing + --mc-dropout used to run
    with a silently-substituted all-ones mask)."""
    enc_cfg = {
        m: {"type": "mlp", "input_dim": 8, "hidden_dim": 16,
            "num_layers": 1, "batch_norm": False, "dropout": 0.0}
        for m in ("a", "b")
    }
    model = MultimodalClassifier(
        modalities=("a", "b"), encoder_configs=enc_cfg, num_classes=4,
        output_dim=8, hidden_dim=16, dropout=0.0, use_modality_mask=True,
    )
    feats = {"a": jax.random.normal(KEY, (6, 8)),
             "b": jax.random.normal(jax.random.PRNGKey(9), (6, 8))}
    variables = dict(model.init(KEY, feats))
    params = variables.pop("params")
    missing_b = jnp.stack(
        [jnp.ones(6), jnp.zeros(6)], axis=1).astype(jnp.float32)
    full, _ = mc_dropout_predict(
        model, params, variables, feats, num_samples=2, key=KEY)
    masked, _ = mc_dropout_predict(
        model, params, variables, feats, num_samples=2, key=KEY,
        mask=missing_b)
    assert not np.allclose(np.asarray(full), np.asarray(masked))
    # dropout=0 -> MC forward == plain forward given the same mask
    plain = model.apply({"params": params, **variables}, feats, missing_b,
                        deterministic=True)
    plain = plain[0] if isinstance(plain, tuple) else plain
    np.testing.assert_allclose(np.asarray(masked), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_mc_dropout_zero_dropout_is_deterministic():
    model, variables, feats = _tiny_model_and_params(dropout=0.0)
    params = variables.pop("params")
    mean_logits, unc = mc_dropout_predict(
        model, params, variables, feats, num_samples=4, key=KEY
    )
    np.testing.assert_allclose(np.asarray(unc), 0.0, atol=1e-10)


def test_ensemble_predict():
    model, variables, feats = _tiny_model_and_params(dropout=0.0)
    params = variables.pop("params")
    # two members with different params
    params2 = jax.tree_util.tree_map(lambda x: x + 0.1, params)
    stacked = stack_params([params, params2])
    stacked_state = stack_params([variables, variables])
    mean_probs, unc = ensemble_predict(model, stacked, stacked_state, feats)
    assert mean_probs.shape == (6, 4)
    np.testing.assert_allclose(np.asarray(mean_probs.sum(-1)), 1.0, rtol=1e-5)
    assert float(unc.max()) > 0.0  # members disagree


def test_vmapped_ensemble_training_feeds_ensemble_predict():
    """N members train in one program; predictions disagree (real ensemble)."""
    from multimodal_emotion_detection_tpu.data.loader import MultimodalLoader
    from multimodal_emotion_detection_tpu.data.synthetic import (
        synthetic_arrays,
    )
    from multimodal_emotion_detection_tpu.parallel.vmap_sweep import (
        train_ensemble,
    )

    model, variables, feats = _tiny_model_and_params(dropout=0.0)
    arrays = synthetic_arrays(32, 4, {"a": 8}, 3, "train", seed=2)
    arrays.features["a"] = arrays.features["a"][:, 0, :]
    loader = MultimodalLoader(arrays, batch_size=16, shuffle=True, seed=4)

    stacked, stacked_ms = train_ensemble(model, loader, n_members=3, epochs=2,
                                         learning_rate=5e-3, seed=9)
    lead = jax.tree_util.tree_leaves(stacked)[0]
    assert lead.shape[0] == 3
    mean_probs, unc = ensemble_predict(
        model, stacked, stacked_ms, feats, num_modalities=1
    )
    assert mean_probs.shape == (6, 4)
    np.testing.assert_allclose(np.asarray(mean_probs.sum(-1)), 1.0, rtol=1e-5)
    assert float(unc.max()) > 0.0  # members genuinely differ


def test_mc_forward_cache_guards_id_reuse_and_purges_dead():
    """id() values are reused after GC: the jit cache must verify the
    weakref still points at the SAME live model, and must purge entries
    for dead models (round-3 advisor finding: an id()-keyed cache served
    a new model the stale jitted forward of a dead one)."""
    import gc

    from multimodal_emotion_detection_tpu.uncertainty import mc_dropout as md

    model_a, _, _ = _tiny_model_and_params()
    fwd_a = md._get_mc_forward(model_a, 1)
    assert md._get_mc_forward(model_a, 1) is fwd_a  # live hit

    # simulate id reuse: plant an entry keyed by model_b's id whose
    # weakref points at a DIFFERENT (still live) model — the guard must
    # reject the hit and rebuild instead of serving the foreign forward
    model_b, _, _ = _tiny_model_and_params(dropout=0.1)
    md._FORWARD_CACHE[(id(model_b), 1)] = (md.weakref.ref(model_a),
                                           "stale-foreign-forward")
    fwd_b = md._get_mc_forward(model_b, 1)
    assert fwd_b != "stale-foreign-forward"
    assert md._get_mc_forward(model_b, 1) is fwd_b

    # the closure keeps cached models alive, so boundedness comes from
    # LRU eviction, not weakref death: flood with fresh models and check
    # the cap holds while the newest entries still hit
    del gc
    keep = [
        _tiny_model_and_params(dropout=0.05 * i)[0]
        for i in range(md._CACHE_MAX + 4)
    ]
    fwds = [md._get_mc_forward(m, 1) for m in keep]
    assert len(md._FORWARD_CACHE) <= md._CACHE_MAX
    assert md._get_mc_forward(keep[-1], 1) is fwds[-1]
