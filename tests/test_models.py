"""Model zoo: encoder/attention/fusion shape + mask-semantics tests.

Port of the reference's per-module __main__ self-tests (SURVEY.md §4:
encoders.py:639-709, attention.py:605-652, fusion.py:705-739) as real
pytest, including the mixed availability mask [[1,1],[1,0],[0,1],[1,1]].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_emotion_detection_tpu.models import (
    CrossModalAttention,
    EarlyFusion,
    FrameEncoder,
    HybridFusion,
    LateFusion,
    LateFusionWithUncertainty,
    MultimodalClassifier,
    PairwiseModalityAttention,
    SequenceEncoder,
    SimpleMLPEncoder,
    TemporalAttention,
    build_encoder,
    build_fusion_model,
    uncertainty_weighted_fusion,
)

KEY = jax.random.PRNGKey(0)
B, T, D, OUT = 4, 12, 8, 10
MIXED_MASK = jnp.array([[1., 1.], [1., 0.], [0., 1.], [1., 1.]])


def _init(module, *args, **kwargs):
    return jax.jit(lambda k: module.init(k, *args, **kwargs))(KEY)


@pytest.mark.parametrize("enc_type", ["lstm", "gru", "cnn", "transformer"])
def test_sequence_encoder_shapes(enc_type):
    enc = SequenceEncoder(input_dim=D, hidden_dim=16, output_dim=OUT,
                          encoder_type=enc_type, num_layers=2)
    x = jax.random.normal(KEY, (B, T, D))
    variables = _init(enc, x)
    out = enc.apply(variables, x)
    assert out.shape == (B, OUT)
    assert bool(jnp.isfinite(out).all())


def test_sequence_encoder_lengths_gather():
    """Padded rows must not change the last-hidden gather result."""
    enc = SequenceEncoder(input_dim=D, hidden_dim=16, output_dim=OUT,
                          encoder_type="lstm", num_layers=1)
    x = jax.random.normal(KEY, (2, T, D))
    variables = _init(enc, x)
    lengths = jnp.array([T, 5])
    out = enc.apply(variables, x, lengths)
    # row 1 with junk after t=5 must equal the same row truncated+re-padded
    x_trunc = x.at[1, 5:].set(123.0)
    out2 = enc.apply(variables, x_trunc, lengths)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pooling", ["attention", "average", "max"])
def test_frame_encoder(pooling):
    enc = FrameEncoder(frame_dim=D, hidden_dim=16, output_dim=OUT,
                       temporal_pooling=pooling)
    x = jax.random.normal(KEY, (B, T, D))
    variables = _init(enc, x)
    out = enc.apply(variables, x)
    assert out.shape == (B, OUT)
    # frame-validity mask changes the result
    fmask = jnp.ones((B, T)).at[:, T // 2:].set(0)
    out_masked = enc.apply(variables, x, fmask)
    assert not np.allclose(np.asarray(out), np.asarray(out_masked))


def test_mlp_encoder_rank2_and_rank3():
    enc = SimpleMLPEncoder(input_dim=D, hidden_dim=16, output_dim=OUT)
    x2 = jax.random.normal(KEY, (B, D))
    variables = _init(enc, x2)
    assert enc.apply(variables, x2).shape == (B, OUT)
    x3 = jax.random.normal(KEY, (B, T, D))
    v3 = _init(enc, x3)
    assert enc.apply(v3, x3).shape == (B, OUT)  # per-step + mean pool


def test_build_encoder_heuristics():
    assert isinstance(build_encoder("video", 16, OUT), FrameEncoder)
    assert isinstance(build_encoder("audio", 16, OUT), SequenceEncoder)
    assert isinstance(build_encoder("heart_rate", 16, OUT), SimpleMLPEncoder)
    assert isinstance(
        build_encoder("x", 16, OUT, {"type": "mlp"}), SimpleMLPEncoder
    )
    with pytest.raises(ValueError, match="Unknown encoder type"):
        build_encoder("x", 16, OUT, {"type": "nope"})


def test_cross_modal_attention_mask_semantics():
    cma = CrossModalAttention(query_dim=D, key_dim=D, hidden_dim=16,
                              num_heads=4)
    q = jax.random.normal(KEY, (B, D))
    kv = jax.random.normal(jax.random.PRNGKey(1), (B, 3, D))
    variables = _init(cma, q, kv, kv)
    out, attn = cma.apply(variables, q, kv, kv)
    assert out.shape == (B, 16) and attn.shape == (B, 4, 1, 3)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)

    # numeric valid-mask auto-inversion: key 1 invalid -> zero weight
    key_mask = jnp.array([[1., 0., 1.]] * B)
    _, attn_m = cma.apply(variables, q, kv, kv, key_mask)
    assert float(jnp.abs(attn_m[:, :, :, 1]).max()) == 0.0

    # all-masked rows -> zero attention, no NaN (ref attention.py:123-128)
    all_masked = jnp.zeros((B, 3))
    out_z, attn_z = cma.apply(variables, q, kv, kv, all_masked)
    assert float(jnp.abs(attn_z).max()) == 0.0
    assert bool(jnp.isfinite(out_z).all())


def test_temporal_attention_and_pooling():
    ta = TemporalAttention(feature_dim=D, hidden_dim=16, num_heads=4)
    x = jax.random.normal(KEY, (B, T, D))
    variables = _init(ta, x)
    seq, w = ta.apply(variables, x, jnp.ones((B, T)))
    assert seq.shape == (B, T, 16) and w.shape == (B, 4, T, T)
    pooled = TemporalAttention.pool_sequence(seq, w)
    assert pooled.shape == (B, 16)


def test_pairwise_modality_attention_zeroes_missing():
    dims = {"a": D, "b": D}
    pma = PairwiseModalityAttention(modality_dims=dims, hidden_dim=16)
    feats = {
        "a": jax.random.normal(KEY, (B, D)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (B, D)),
    }
    variables = _init(pma, feats, MIXED_MASK)
    attended, maps = pma.apply(variables, feats, MIXED_MASK)
    assert set(maps) == {"a_to_b", "b_to_a"}
    # sample 2 has modality a missing -> its attended['a'] row is zero
    assert float(jnp.abs(attended["a"][2]).max()) == 0.0
    assert float(jnp.abs(attended["b"][1]).max()) == 0.0
    assert bool(jnp.isfinite(attended["a"]).all())


@pytest.mark.parametrize("fusion_type", ["early", "late", "hybrid"])
def test_fusions_mixed_mask(fusion_type):
    dims = {"a": D, "b": D}
    model = build_fusion_model(fusion_type, dims, num_classes=5,
                               hidden_dim=16, num_heads=4, dropout=0.1)
    feats = {
        "a": jax.random.normal(KEY, (B, D)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (B, D)),
    }
    variables = _init(model, feats, MIXED_MASK)
    out = model.apply(variables, feats, MIXED_MASK)
    logits = out[0] if isinstance(out, tuple) else out
    assert logits.shape == (B, 5)
    assert bool(jnp.isfinite(logits).all())


def test_late_fusion_mask_renormalization():
    dims = {"a": D, "b": D}
    model = LateFusion(modality_dims=dims, hidden_dim=16, num_classes=5)
    feats = {
        "a": jax.random.normal(KEY, (B, D)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (B, D)),
    }
    variables = _init(model, feats, MIXED_MASK)
    fused, per_mod = model.apply(variables, feats, MIXED_MASK)
    # sample 1 keeps only modality a -> fused logits == a's logits
    np.testing.assert_allclose(np.asarray(fused[1]),
                               np.asarray(per_mod["a"][1]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fused[2]),
                               np.asarray(per_mod["b"][2]), rtol=1e-5)


def test_hybrid_fusion_return_attention():
    dims = {"a": D, "b": D}
    model = HybridFusion(modality_dims=dims, hidden_dim=16, num_classes=5)
    feats = {
        "a": jax.random.normal(KEY, (B, D)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (B, D)),
    }
    variables = _init(model, feats, MIXED_MASK)
    logits, info = model.apply(variables, feats, MIXED_MASK,
                               return_attention=True)
    w = np.asarray(info["fusion_weights"])
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    assert w[1, 1] == pytest.approx(0.0, abs=1e-6)  # masked modality b
    assert info["H_att"].shape == (B, 2, 16)


def test_uncertainty_weighted_fusion_math():
    logits = jnp.stack([jnp.ones((B, 5)), 3 * jnp.ones((B, 5))], axis=1)
    unc = jnp.array([[0.1, 0.1]] * B)
    fused, w = uncertainty_weighted_fusion(logits, unc, jnp.ones((B, 2)))
    np.testing.assert_allclose(np.asarray(fused), 2.0, rtol=1e-4)
    # mask kills modality 1
    fused2, w2 = uncertainty_weighted_fusion(logits, unc, MIXED_MASK)
    np.testing.assert_allclose(np.asarray(fused2[1]), 1.0, rtol=1e-4)
    # lower uncertainty -> higher weight
    unc3 = jnp.array([[0.01, 1.0]] * B)
    _, w3 = uncertainty_weighted_fusion(logits, unc3, jnp.ones((B, 2)))
    assert float(w3[0, 0]) > float(w3[0, 1])


def test_late_fusion_with_uncertainty():
    dims = {"a": D, "b": D}
    model = LateFusionWithUncertainty(modality_dims=dims, num_classes=5,
                                      hidden_dim=8)
    feats = {
        "a": jax.random.normal(KEY, (B, D)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (B, D)),
    }
    variables = _init(model, feats, MIXED_MASK)
    fused, aux = model.apply(variables, feats, MIXED_MASK)
    assert fused.shape == (B, 5)
    assert aux["per_modality_logits"].shape == (B, 2, 5)
    assert float(aux["uncertainties"].min()) >= 0.0
    np.testing.assert_allclose(
        np.asarray(aux["fusion_weights"].sum(-1)), 1.0, rtol=1e-4
    )


def test_classifier_concat_vs_library():
    enc_cfg = {
        "a": {"type": "mlp", "input_dim": D, "hidden_dim": 8, "num_layers": 1,
              "batch_norm": False},
        "b": {"type": "mlp", "input_dim": D, "hidden_dim": 8, "num_layers": 1,
              "batch_norm": False},
    }
    feats = {
        "a": jax.random.normal(KEY, (B, D)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (B, D)),
    }
    for train_fusion in ("concat", "library"):
        clf = MultimodalClassifier(
            modalities=("a", "b"), encoder_configs=enc_cfg, num_classes=5,
            output_dim=6, hidden_dim=8, train_fusion=train_fusion,
            fusion_type="hybrid",
        )
        variables = _init(clf, feats)
        logits = clf.apply(variables, feats)
        assert logits.shape == (B, 5)


def test_classifier_mask_ignored_by_default():
    """Reference quirk #2 parity: mask must not change concat-path output."""
    enc_cfg = {
        "a": {"type": "mlp", "input_dim": D, "hidden_dim": 8, "num_layers": 1,
              "batch_norm": False},
    }
    feats = {"a": jax.random.normal(KEY, (B, D))}
    clf = MultimodalClassifier(modalities=("a",), encoder_configs=enc_cfg,
                               num_classes=5, output_dim=6, hidden_dim=8)
    variables = _init(clf, feats)
    out1 = clf.apply(variables, feats, jnp.ones((B, 1)))
    out2 = clf.apply(variables, feats, jnp.zeros((B, 1)))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_rnn_chunked_remat_matches_full_scan():
    """Long-T path (chunked + jax.checkpoint) must equal the plain scan."""
    from multimodal_emotion_detection_tpu.models.recurrent import (
        GRULayer,
        LSTMLayer,
    )

    x = jax.random.normal(KEY, (2, 70, 3))
    for cls in (LSTMLayer, GRULayer):
        full = cls(hidden_dim=16, chunk_size=0)
        chunked = cls(hidden_dim=16, chunk_size=16)  # 70 = 4*16 + 6 (pad)
        # chunk_size is not a parameter, so weights are interchangeable
        variables = jax.jit(lambda k: full.init(k, x))(KEY)
        ys_f, h_f = full.apply(variables, x)
        ys_c, h_c = chunked.apply(variables, x)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_c),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_c),
                                   rtol=1e-5, atol=1e-6)
        # gradients flow through the remat path
        def loss(v):
            _, h = chunked.apply(v, x)
            return (h ** 2).sum()
        g = jax.grad(loss)(variables)
        assert all(
            bool(jnp.isfinite(leaf).all())
            for leaf in jax.tree_util.tree_leaves(g)
        )


def test_transformer_blockwise_long_sequence():
    """T > max_len triggers block-local attention; short-T semantics keep."""
    enc = SequenceEncoder(input_dim=D, hidden_dim=16, output_dim=OUT,
                          encoder_type="transformer", num_layers=1,
                          max_len=32, attention_block=16)
    x = jax.random.normal(KEY, (2, 70, D))  # 70 > 32 -> blockwise, pads to 80
    variables = _init(enc, x)
    out = enc.apply(variables, x)
    assert out.shape == (2, OUT)
    assert bool(jnp.isfinite(out).all())
    # variable lengths still honoured
    out_len = enc.apply(variables, x, jnp.array([70, 20]))
    assert bool(jnp.isfinite(out_len).all())
    # row with junk beyond its length must be unaffected
    x_junk = x.at[1, 20:].set(55.0)
    out_junk = enc.apply(variables, x_junk, jnp.array([70, 20]))
    np.testing.assert_allclose(np.asarray(out_len[1]), np.asarray(out_junk[1]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_fused_stacked_rnn_matches_layerwise(cell):
    """FusedStackedRNN == StackedRNN with the same parameter tree."""
    from multimodal_emotion_detection_tpu.models.recurrent import (
        FusedStackedRNN,
        StackedRNN,
    )

    x = jax.random.normal(KEY, (3, 15, 6))
    ref = StackedRNN(hidden_dim=10, num_layers=2, cell_type=cell)
    variables = jax.jit(lambda k: ref.init(k, x))(KEY)
    ys_ref, h_ref = ref.apply(variables, x)

    fused = FusedStackedRNN(hidden_dim=10, num_layers=2, cell_type=cell)
    # same parameter names -> same tree (nested under layer_i)
    ys_f, h_f = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_inference_kernel_path_matches_scan(cell):
    """SequenceEncoder(inference_kernel=True) uses the Pallas recurrence at
    eval (interpret off-TPU) and must match the scan path exactly (the GRU
    twin gru2_infer_pallas serves the fastest training family — round-4
    verdict item 4)."""
    enc_scan = SequenceEncoder(input_dim=6, hidden_dim=128, output_dim=OUT,
                               encoder_type=cell, num_layers=2)
    enc_kernel = SequenceEncoder(input_dim=6, hidden_dim=128, output_dim=OUT,
                                 encoder_type=cell, num_layers=2,
                                 inference_kernel=True)
    x = jax.random.normal(KEY, (8, 40, 6))
    variables = _init(enc_scan, x)
    out_scan = enc_scan.apply(variables, x)
    out_kernel = enc_kernel.apply(variables, x)  # same params, kernel path
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_scan),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_lstm_matches_autodiff_through_encoder():
    """FusedStackedRNN's hoisted-gradient backward == plain autodiff."""
    from multimodal_emotion_detection_tpu.models.recurrent import (
        FusedStackedRNN,
        StackedRNN,
    )

    x = jax.random.normal(KEY, (4, 21, 6))
    ref = StackedRNN(hidden_dim=12, num_layers=2, cell_type="lstm")
    variables = jax.jit(lambda k: ref.init(k, x))(KEY)
    fused = FusedStackedRNN(hidden_dim=12, num_layers=2, cell_type="lstm")

    def loss(module, v, x):
        ys, h = module.apply(v, x)
        return (ys ** 2).sum() * 0.1 + (h ** 3).sum()

    val_ref, grad_ref = jax.value_and_grad(
        lambda v: loss(ref, v, x)
    )(variables)
    val_f, grad_f = jax.value_and_grad(
        lambda v: loss(fused, v, x)
    )(variables)
    np.testing.assert_allclose(float(val_f), float(val_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grad_f),
                    jax.tree_util.tree_leaves(grad_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_custom_vjp_lstm_with_dropout_grads_finite():
    from multimodal_emotion_detection_tpu.models.recurrent import (
        FusedStackedRNN,
    )

    x = jax.random.normal(KEY, (4, 15, 6))
    fused = FusedStackedRNN(hidden_dim=12, num_layers=2, cell_type="lstm",
                            dropout=0.3)
    variables = jax.jit(lambda k: fused.init(k, x))(KEY)

    def loss(v):
        ys, h = fused.apply(v, x, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(2)})
        return (h ** 2).sum()

    grads = jax.grad(loss)(variables)
    assert all(bool(jnp.isfinite(leaf).all())
               for leaf in jax.tree_util.tree_leaves(grads))


@pytest.mark.parametrize("n_layers", [1, 3])
def test_custom_vjp_lstm_n_layers(n_layers):
    """The hoisted-gradient VJP generalizes to 1- and 3-layer LSTMs."""
    from multimodal_emotion_detection_tpu.models.recurrent import (
        FusedStackedRNN,
        StackedRNN,
    )

    x = jax.random.normal(KEY, (3, 13, 5))
    ref = StackedRNN(hidden_dim=8, num_layers=n_layers, cell_type="lstm")
    variables = jax.jit(lambda k: ref.init(k, x))(KEY)
    fused = FusedStackedRNN(hidden_dim=8, num_layers=n_layers,
                            cell_type="lstm")

    def loss(module, v):
        ys, h = module.apply(v, x)
        return (ys ** 2).sum() * 0.1 + (h ** 3).sum()

    val_ref, grad_ref = jax.value_and_grad(lambda v: loss(ref, v))(variables)
    val_f, grad_f = jax.value_and_grad(lambda v: loss(fused, v))(variables)
    np.testing.assert_allclose(float(val_f), float(val_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grad_f),
                    jax.tree_util.tree_leaves(grad_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_custom_vjp_dkeep_correct():
    """d(loss)/d(keep-mask) of fused_lstm matches autodiff (3 layers)."""
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import fused_lstm

    rng = np.random.RandomState(0)
    B_, T_, D_, H_, L_ = 2, 9, 4, 8, 3
    x = jnp.asarray(rng.randn(B_, T_, D_), jnp.float32)
    keep = jnp.asarray(rng.rand(B_, T_, L_ - 1, H_), jnp.float32) + 0.5
    k = 0.3
    params = tuple(
        {
            "w_ih": jnp.asarray(
                rng.uniform(-k, k, (D_ if i == 0 else H_, 4 * H_)),
                jnp.float32),
            "w_hh": jnp.asarray(rng.uniform(-k, k, (H_, 4 * H_)), jnp.float32),
            "b": jnp.asarray(rng.uniform(-k, k, (4 * H_,)), jnp.float32),
        }
        for i in range(L_)
    )

    def ref_impl(x, keep, params):
        x_tm = jnp.swapaxes(x, 0, 1)
        keep_tm = jnp.transpose(keep, (1, 2, 0, 3))

        def cell(h, c, g):
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            return jax.nn.sigmoid(o) * jnp.tanh(c2), c2

        def step(carry, inp):
            x_t, keep_t = inp
            new = []
            inp_l = x_t
            for li, p in enumerate(params):
                h, c = carry[li]
                g = inp_l @ p["w_ih"] + p["b"] + h @ p["w_hh"]
                h, c = cell(h, c, g)
                new.append((h, c))
                inp_l = h if li == L_ - 1 else h * keep_t[li]
            return tuple(new), new[-1][0]

        z = jnp.zeros((B_, H_), jnp.float32)
        carry, ys = jax.lax.scan(step, tuple((z, z) for _ in range(L_)),
                                 (x_tm, keep_tm))
        return jnp.swapaxes(ys, 0, 1), carry[-1][0]

    def loss(fn):
        def inner(x, keep, params):
            ys, h = fn(x, keep, params)
            return (ys ** 2).sum() + (h * 0.7).sum()
        return inner

    g_fused = jax.grad(loss(fused_lstm), argnums=(0, 1, 2))(x, keep, params)
    g_ref = jax.grad(loss(ref_impl), argnums=(0, 1, 2))(x, keep, params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n_layers", [1, 2])
def test_custom_vjp_gru_matches_autodiff(n_layers):
    from multimodal_emotion_detection_tpu.models.recurrent import (
        FusedStackedRNN,
        StackedRNN,
    )

    x = jax.random.normal(KEY, (3, 14, 5))
    ref = StackedRNN(hidden_dim=8, num_layers=n_layers, cell_type="gru")
    variables = jax.jit(lambda k: ref.init(k, x))(KEY)
    fused = FusedStackedRNN(hidden_dim=8, num_layers=n_layers,
                            cell_type="gru")

    def loss(module, v):
        ys, h = module.apply(v, x)
        return (ys ** 2).sum() * 0.1 + (h ** 3).sum()

    val_ref, grad_ref = jax.value_and_grad(lambda v: loss(ref, v))(variables)
    val_f, grad_f = jax.value_and_grad(lambda v: loss(fused, v))(variables)
    np.testing.assert_allclose(float(val_f), float(val_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grad_f),
                    jax.tree_util.tree_leaves(grad_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_image_cnn_encoder_rank4_and_rank5():
    from multimodal_emotion_detection_tpu.models.encoders import (
        ImageCNNEncoder,
    )

    enc = ImageCNNEncoder(backbone="resnet18", output_dim=OUT,
                          temporal_pooling="attention")
    imgs = jax.random.normal(KEY, (2, 32, 32, 3))
    variables = _init(enc, imgs)
    out4 = enc.apply(variables, imgs, mutable=False)
    assert out4.shape == (2, OUT)

    frames = jax.random.normal(KEY, (2, 3, 32, 32, 3))
    v5 = _init(enc, frames)
    out5 = enc.apply(v5, frames)
    assert out5.shape == (2, OUT)
    fmask = jnp.array([[1., 1., 0.], [1., 0., 0.]])
    out5m = enc.apply(v5, frames, fmask)
    assert not np.allclose(np.asarray(out5), np.asarray(out5m))


def test_early_fusion_learned_missing_tokens():
    """learned_missing=True substitutes a trained token for masked
    modalities (a real option here; the reference gates on an attribute
    that never exists, fusion.py:128-132)."""
    dims = {"a": D, "b": D}
    model = EarlyFusion(modality_dims=dims, hidden_dim=16, num_classes=5,
                        learned_missing=True)
    feats = {
        "a": jax.random.normal(KEY, (B, D)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (B, D)),
    }
    variables = _init(model, feats, MIXED_MASK)
    assert "missing_a" in variables["params"]
    # with zero-init tokens, masked output == zero-fill output...
    out = model.apply(variables, feats, MIXED_MASK)
    # ...but a nonzero token changes masked rows only
    bumped = jax.tree_util.tree_map(lambda x: x, variables)
    bumped = {"params": dict(variables["params"])}
    bumped["params"]["missing_b"] = jnp.ones((D,)) * 5.0
    out2 = model.apply(bumped, feats, MIXED_MASK)
    diff = np.abs(np.asarray(out) - np.asarray(out2)).max(axis=1)
    assert diff[1] > 0  # sample 1 has modality b missing
    assert diff[0] == pytest.approx(0.0, abs=1e-6)  # fully present rows


def test_compute_adaptive_weights():
    from multimodal_emotion_detection_tpu.models.fusion import (
        compute_adaptive_weights,
    )

    feats = {
        "a": jnp.ones((B, D)) * 3.0,  # big norm
        "b": jnp.ones((B, D)) * 0.1,  # small norm
    }
    w = compute_adaptive_weights(feats, jnp.ones((B, 2)), ["a", "b"])
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    assert float(w[0, 0]) > float(w[0, 1])  # norm-based preference
    # masked modality -> zero weight
    w2 = compute_adaptive_weights(feats, MIXED_MASK, ["a", "b"])
    assert float(w2[1, 1]) == 0.0


def test_on_device_video_frontend_matches_etl():
    """video_frontend='resize' on raw frames == ETL's host-side transform."""
    from multimodal_emotion_detection_tpu.ops.resize import area_resize_np

    rng = np.random.RandomState(0)
    raw = (rng.rand(2, 3, 48, 40, 3) * 255).astype(np.float32)  # BGR frames
    # ETL path: BT.601 gray -> area resize -> /255 -> flatten
    gray = raw @ np.array([0.114, 0.587, 0.299], np.float32)
    etl = area_resize_np(gray, 16, 16) / 255.0
    etl = etl.reshape(2, 3, 256)

    enc_cfg = {"video": {"type": "frame", "input_dim": 256,
                         "hidden_dim": 8, "dropout": 0.0}}
    clf_etl = MultimodalClassifier(
        modalities=("video",), encoder_configs=enc_cfg, num_classes=4,
        output_dim=6, hidden_dim=8,
    )
    clf_raw = MultimodalClassifier(
        modalities=("video",), encoder_configs=enc_cfg, num_classes=4,
        output_dim=6, hidden_dim=8,
        video_frontend="resize", video_hw=(16, 16),
    )
    variables = _init(clf_etl, {"video": jnp.asarray(etl)})
    out_etl = clf_etl.apply(variables, {"video": jnp.asarray(etl)})
    out_raw = clf_raw.apply(variables, {"video": jnp.asarray(raw)})
    np.testing.assert_allclose(np.asarray(out_raw), np.asarray(out_etl),
                               rtol=1e-4, atol=1e-5)


def test_classifier_transformer_use_flash_from_config():
    """use_flash flows config -> build_encoder -> TransformerBlock; the
    flash path (interpret on CPU) matches the XLA MHA path on shared
    params, and with dropout active the training call falls back to the
    XLA path without a param-tree mismatch."""
    feats = {"a": jax.random.normal(KEY, (B, 12, D))}

    def make(use_flash):
        return MultimodalClassifier(
            modalities=("a",),
            encoder_configs={"a": {
                "type": "sequence", "encoder_type": "transformer",
                "input_dim": D, "hidden_dim": 8, "num_layers": 1,
                "dropout": 0.3, "use_flash": use_flash,
            }},
            num_classes=5, output_dim=6, hidden_dim=8,
        )

    xla_clf, flash_clf = make(False), make(True)
    variables = _init(xla_clf, feats)
    ref = xla_clf.apply(variables, feats, deterministic=True)
    # NOTE: flash_interpret isn't plumbed through the classifier config;
    # on the CPU test backend the module auto-selects interpret mode.
    out = flash_clf.apply(variables, feats, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # dropout>0 + deterministic=False -> XLA fallback on the same params
    out_train = flash_clf.apply(
        variables, feats, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out_train.shape == (B, 5)


def test_per_encoder_dtype_override_mixed_precision():
    """encoder config 'dtype' key runs that encoder in bf16 while the rest
    of the model (other encoders, fusion/head, logits) stays f32."""
    enc_cfg = {
        "a": {"type": "mlp", "input_dim": D, "hidden_dim": 8, "num_layers": 1,
              "batch_norm": False, "dtype": "bfloat16"},
        "b": {"type": "mlp", "input_dim": D, "hidden_dim": 8, "num_layers": 1,
              "batch_norm": False},
    }
    feats = {
        "a": jax.random.normal(KEY, (B, D)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (B, D)),
    }
    clf = MultimodalClassifier(
        modalities=("a", "b"), encoder_configs=enc_cfg, num_classes=5,
        output_dim=6, hidden_dim=8,
    )
    variables = _init(clf, feats)
    logits = clf.apply(variables, feats)
    assert logits.dtype == jnp.float32
    assert logits.shape == (B, 5)
    # params stay f32 (flax keeps param dtype; only compute is bf16)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    # the override actually changes encoder-a's compute: its embedding is
    # bf16-rounded relative to an all-f32 model
    clf32 = MultimodalClassifier(
        modalities=("a", "b"), encoder_configs={
            "a": {k: v for k, v in enc_cfg["a"].items() if k != "dtype"},
            "b": dict(enc_cfg["b"]),
        }, num_classes=5, output_dim=6, hidden_dim=8,
    )
    logits32 = clf32.apply(variables, feats)
    assert not np.array_equal(np.asarray(logits), np.asarray(logits32))


@pytest.mark.parametrize("final_only", [False, True])
def test_layered_fwd_kernel_path_matches_autodiff(final_only):
    """The per-layer forward kernel route (any-depth / large-H: the big
    sweep config's LSTM x3 h512) in interpret mode must match value AND
    gradients of plain autodiff through the scan path (3 layers)."""
    from multimodal_emotion_detection_tpu.ops import lstm_vjp as lv
    from multimodal_emotion_detection_tpu.ops.lstm_vjp import (
        fused_lstm,
        fused_lstm_final,
    )

    n_layers, h = 3, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 2 + 2 * n_layers)
    x = jax.random.normal(ks[0], (8, 21, 6))
    keep = (jax.random.uniform(ks[1], (8, 21, n_layers - 1, h)) > 0.3
            ).astype(jnp.float32)
    params = tuple(
        {"w_ih": 0.3 * jax.random.normal(
            ks[2 + 2 * i], (6 if i == 0 else h, 4 * h)),
         "w_hh": 0.3 * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
         "b": jnp.full((4 * h,), 0.01)}
        for i in range(n_layers)
    )

    def loss(p, x):
        if final_only:
            hf = fused_lstm_final(x, keep, p)
            return (hf ** 3).sum()
        ys, hf = fused_lstm(x, keep, p)
        return (ys ** 2).sum() * 0.1 + (hf ** 3).sum()

    prev_f = lv.set_fwd_kernel_mode("off")
    prev_b = lv.set_bwd_kernel_mode("off")
    try:
        val_ref, grad_ref = jax.value_and_grad(loss)(params, x)
        lv.set_fwd_kernel_mode("interpret")
        lv.set_bwd_kernel_mode("interpret")
        # route check: the layered forward must actually engage here
        x_tm = jnp.swapaxes(x, 0, 1)
        ok, interp = lv._fwd_layered_ok(x_tm, params)
        assert ok and interp
        val_k, grad_k = jax.value_and_grad(loss)(params, x)
    finally:
        lv.set_fwd_kernel_mode(prev_f)
        lv.set_bwd_kernel_mode(prev_b)
    np.testing.assert_allclose(float(val_k), float(val_ref), rtol=2e-5)
    # the layered route reorders accumulations (hoisted per-layer ih,
    # padded contractions), so grads carry fp-noise-level differences;
    # a math bug shows as O(1) error, far beyond this envelope
    for a, b in zip(jax.tree_util.tree_leaves(grad_k),
                    jax.tree_util.tree_leaves(grad_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
