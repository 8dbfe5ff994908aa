"""Numerical parity vs torch (CPU) with copied weights.

The reference's recurrences are ``nn.LSTM``/``nn.GRU``
(/root/reference/src/encoders.py:54-77); these tests copy one set of
weights into both implementations and require the scan-based re-design to
reproduce torch's outputs to float32 tolerance — gate order, reset-gate
placement, inter-layer wiring and all.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_emotion_detection_tpu.models.recurrent import (  # noqa: E402
    GRULayer,
    LSTMLayer,
    StackedRNN,
)

B, T, D, H = 3, 11, 5, 8


def _np(x):
    return x.detach().numpy()


def test_lstm_layer_matches_torch():
    torch.manual_seed(0)
    ref = torch.nn.LSTM(D, H, num_layers=1, batch_first=True)
    x = torch.randn(B, T, D)
    out_t, (h_t, c_t) = ref(x)

    ours = LSTMLayer(hidden_dim=H)
    variables = {
        "params": {
            "w_ih": _np(ref.weight_ih_l0).T,  # (4H, D) -> (D, 4H)
            "w_hh": _np(ref.weight_hh_l0).T,
            "b": _np(ref.bias_ih_l0 + ref.bias_hh_l0),
        }
    }
    ys, h_last = ours.apply(variables, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(ys), _np(out_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), _np(h_t[0]), atol=1e-5)


def test_gru_layer_matches_torch():
    torch.manual_seed(1)
    ref = torch.nn.GRU(D, H, num_layers=1, batch_first=True)
    x = torch.randn(B, T, D)
    out_t, h_t = ref(x)

    ours = GRULayer(hidden_dim=H)
    variables = {
        "params": {
            "w_ih": _np(ref.weight_ih_l0).T,
            "w_hh": _np(ref.weight_hh_l0).T,
            "b_ih": _np(ref.bias_ih_l0),
            "b_hh": _np(ref.bias_hh_l0),
        }
    }
    ys, h_last = ours.apply(variables, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(ys), _np(out_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), _np(h_t[0]), atol=1e-5)


def test_stacked_lstm_matches_torch():
    torch.manual_seed(2)
    ref = torch.nn.LSTM(D, H, num_layers=2, batch_first=True)
    x = torch.randn(B, T, D)
    out_t, (h_t, _) = ref(x)

    ours = StackedRNN(hidden_dim=H, num_layers=2, cell_type="lstm")
    variables = {
        "params": {
            "layer_0": {
                "w_ih": _np(ref.weight_ih_l0).T,
                "w_hh": _np(ref.weight_hh_l0).T,
                "b": _np(ref.bias_ih_l0 + ref.bias_hh_l0),
            },
            "layer_1": {
                "w_ih": _np(ref.weight_ih_l1).T,
                "w_hh": _np(ref.weight_hh_l1).T,
                "b": _np(ref.bias_ih_l1 + ref.bias_hh_l1),
            },
        }
    }
    ys, h_last = ours.apply(variables, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(ys), _np(out_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), _np(h_t[-1]), atol=1e-5)


def test_chunked_lstm_matches_torch_long_sequence():
    """The remat'd long-sequence path against torch on T=1500."""
    torch.manual_seed(3)
    t_long = 1500
    ref = torch.nn.LSTM(1, H, num_layers=1, batch_first=True)
    x = torch.randn(2, t_long, 1)
    out_t, (h_t, _) = ref(x)

    ours = LSTMLayer(hidden_dim=H, chunk_size=256)  # forces chunked path
    variables = {
        "params": {
            "w_ih": _np(ref.weight_ih_l0).T,
            "w_hh": _np(ref.weight_hh_l0).T,
            "b": _np(ref.bias_ih_l0 + ref.bias_hh_l0),
        }
    }
    ys, h_last = ours.apply(variables, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(h_last), _np(h_t[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ys), _np(out_t), atol=3e-5)


def test_transformer_block_matches_torch():
    """Post-LN encoder layer vs torch nn.TransformerEncoderLayer (eval)."""
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.models.encoders import (
        TransformerBlock,
    )

    e, heads = 16, 4
    torch.manual_seed(4)
    ref = torch.nn.TransformerEncoderLayer(
        d_model=e, nhead=heads, dim_feedforward=e * 4, dropout=0.0,
        activation="gelu", batch_first=True,
    ).eval()
    x = torch.randn(B, T, e)
    with torch.no_grad():
        out_t = ref(x)

    hd = e // heads
    w_in = _np(ref.self_attn.in_proj_weight)  # (3E, E)
    b_in = _np(ref.self_attn.in_proj_bias)

    def qkv(i):
        w = w_in[i * e:(i + 1) * e].T  # (E, E), x @ w
        b = b_in[i * e:(i + 1) * e]
        return w.reshape(e, heads, hd), b.reshape(heads, hd)

    wq, bq = qkv(0)
    wk, bk = qkv(1)
    wv, bv = qkv(2)
    wo = _np(ref.self_attn.out_proj.weight).T.reshape(heads, hd, e)
    bo = _np(ref.self_attn.out_proj.bias)

    block = TransformerBlock(hidden_dim=e, num_heads=heads, dropout=0.0)
    variables = {
        "params": {
            "self_attn": {
                "query": {"kernel": wq, "bias": bq},
                "key": {"kernel": wk, "bias": bk},
                "value": {"kernel": wv, "bias": bv},
                "out": {"kernel": wo, "bias": bo},
            },
            "ln1": {"scale": _np(ref.norm1.weight), "bias": _np(ref.norm1.bias)},
            "ln2": {"scale": _np(ref.norm2.weight), "bias": _np(ref.norm2.bias)},
            "ffn_in": {"kernel": _np(ref.linear1.weight).T,
                       "bias": _np(ref.linear1.bias)},
            "ffn_out": {"kernel": _np(ref.linear2.weight).T,
                        "bias": _np(ref.linear2.bias)},
        }
    }
    ours = block.apply(variables, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(ours), _np(out_t), atol=2e-5)


class _TorchBasicBlock(torch.nn.Module):
    """torchvision BasicBlock wiring with matching parameter names."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class _TorchResNet18(torch.nn.Module):
    """torchvision-resnet18-shaped backbone (fc omitted)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        for i, (cin, cout, stride) in enumerate(
            [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        ):
            layer = torch.nn.Sequential(
                _TorchBasicBlock(cin, cout, stride),
                _TorchBasicBlock(cout, cout, 1),
            )
            setattr(self, f"layer{i + 1}", layer)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.maxpool(y)
        for i in range(4):
            y = getattr(self, f"layer{i + 1}")(y)
        return y.mean(dim=(2, 3))  # global average pool -> (B, 512)


def test_resnet_torch_weight_import():
    """load_torch_resnet_weights: a torchvision-layout state_dict produces
    identical features from our flax ResNet."""
    import jax

    from multimodal_emotion_detection_tpu.models.resnet import (
        ResNet,
        load_torch_resnet_weights,
    )

    torch.manual_seed(5)
    ref = _TorchResNet18().eval()
    # randomize BN stats so running-average usage is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        feats_ref = ref(x).numpy()

    net = ResNet(variant="resnet18")
    x_jax = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))  # NCHW->NHWC
    variables = jax.jit(lambda k: net.init(k, x_jax))(jax.random.PRNGKey(0))
    imported = load_torch_resnet_weights(dict(variables), ref.state_dict(),
                                         variant="resnet18")
    feats = net.apply(
        {"params": imported["params"],
         "batch_stats": imported["batch_stats"]},
        x_jax, deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(feats), feats_ref,
                               rtol=1e-4, atol=1e-4)


def test_pretrained_weights_path_trains_end_to_end(tmp_path):
    """The ``model.encoders.<m>.weights_path`` config knob: a user with a
    locally-saved torchvision-layout ``.pth`` file gets those weights in an
    actual training run (the zero-egress path replacing the reference's
    ``pretrained=True`` download, /root/reference/src/encoders.py:400-529).
    """
    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.data.loader import create_dataloaders
    from multimodal_emotion_detection_tpu.training.loop import Trainer

    torch.manual_seed(11)
    ref = _TorchResNet18().eval()
    pth = tmp_path / "resnet18.pth"
    torch.save(ref.state_dict(), pth)

    # tiny on-disk dataset with image-shaped video: (N, T=2, 16, 16, 3)
    rng = np.random.RandomState(3)
    data_dir = tmp_path / "data"
    for split, n in [("train", 16), ("val", 8), ("test", 8)]:
        d = data_dir / split
        d.mkdir(parents=True)
        np.save(d / "video.npy",
                rng.rand(n, 2, 16, 16, 3).astype(np.float32))
        np.save(d / "labels.npy", rng.randint(0, 4, size=n).astype(np.int64))

    cfg = Config()
    apply_overrides(cfg, [
        "dataset.name=ravdess",
        f"dataset.data_dir={data_dir}",
        "dataset.modalities=[video]",
        "dataset.num_classes=4",
        "dataset.batch_size=8",
        ("model.encoders={video: {type: pretrained_cnn, backbone: resnet18, "
         + f"weights_path: '{pth}', temporal_pooling: average}}}}"),
        "model.output_dim=8",
        "model.hidden_dim=16",
        "training.max_epochs=1",
    ])
    train_loader, val_loader, _ = create_dataloaders(
        cfg.dataset.name, cfg.dataset.data_dir, cfg.dataset.modalities,
        batch_size=cfg.dataset.batch_size, seed=cfg.seed,
    )
    trainer = Trainer(cfg, save_dir=tmp_path / "run")
    trainer.fit(train_loader, val_loader)

    # the initialized state must carry the torch weights (not random init):
    # stem conv kernel == torch conv1 OIHW->HWIO... minus one AdamW step.
    stem = np.asarray(
        jax.device_get(
            trainer.state.params["video_encoder"]["backbone"]["stem_conv"][
                "kernel"
            ]
        )
    )
    want = np.transpose(ref.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    # after 2 optimizer steps of lr 1e-3 the drift is bounded by ~steps*lr
    assert np.abs(stem - want).max() < 5e-2
    assert np.abs(stem - want).max() > 0  # it did train
    # BN running stats grafted exactly (not updated by eval passes alone?
    # train steps do update them — check the graft happened by magnitude)
    bs = trainer.state.model_state["batch_stats"]["video_encoder"]["backbone"]
    got_var = np.asarray(jax.device_get(bs["stem_bn"]["var"]))
    want_var = ref.state_dict()["bn1.running_var"].numpy()
    assert np.abs(got_var - want_var).max() < 0.5
