"""Reference-checkpoint import: torch state_dict -> our params, full-model
logits parity.

Builds a torch model with the reference's exact wiring (LSTM audio encoder
-> last hidden -> Linear; video frame MLP -> attention pool -> LayerNorm ->
Linear; concat -> Linear -> ReLU -> Linear, per
/root/reference/src/train.py:50-164 + encoders.py), runs it in eval mode,
imports its state_dict, and requires the MultimodalClassifier to reproduce
the logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_emotion_detection_tpu.models import MultimodalClassifier  # noqa: E402
from multimodal_emotion_detection_tpu.utils.torch_import import (  # noqa: E402
    import_reference_state_dict,
)

B, T_A, T_V = 3, 30, 6
AUDIO_D, VIDEO_D, HID, OUT_D, HEAD_H, C = 4, 32, 24, 16, 20, 8


class TorchReferenceModel(torch.nn.Module):
    """The reference's active flagship wiring, independently implemented."""

    def __init__(self):
        super().__init__()
        self.audio_rnn = torch.nn.LSTM(AUDIO_D, HID, num_layers=2,
                                       batch_first=True)
        self.audio_proj = torch.nn.Linear(HID, OUT_D)
        self.frame_mlp = torch.nn.Linear(VIDEO_D, HID)
        self.attention = torch.nn.Linear(HID, 1)
        self.video_ln = torch.nn.LayerNorm(HID)
        self.video_proj = torch.nn.Linear(HID, OUT_D)
        self.head_in = torch.nn.Linear(2 * OUT_D, HEAD_H)
        self.head_out = torch.nn.Linear(HEAD_H, C)

    def forward(self, audio, video):
        _, (h_n, _) = self.audio_rnn(audio)
        a = self.audio_proj(h_n[-1])
        x = torch.relu(self.frame_mlp(video))
        w = torch.softmax(self.attention(x).squeeze(-1), dim=1)
        pooled = torch.einsum("bt,bth->bh", w, x)
        v = self.video_proj(self.video_ln(pooled))
        h = torch.relu(self.head_in(torch.cat([a, v], dim=-1)))
        return self.head_out(h)

    def reference_state_dict(self):
        """Rename to the reference LightningModule's key layout."""
        sd = self.state_dict()
        out = {}
        rename = {
            "audio_rnn.": "encoders.audio.rnn.",
            "audio_proj.": "encoders.audio.projection.",
            "frame_mlp.": "encoders.video.frame_mlp.0.",
            "attention.": "encoders.video.attention.",
            "video_ln.": "encoders.video.projection.0.",
            "video_proj.": "encoders.video.projection.1.",
            "head_in.": "fusion_head.0.",
            "head_out.": "fusion_head.2.",
        }
        for key, value in sd.items():
            for old, new in rename.items():
                if key.startswith(old):
                    out[new + key[len(old):]] = value
                    break
        return out


def test_imported_reference_checkpoint_reproduces_logits():
    torch.manual_seed(0)
    ref = TorchReferenceModel().eval()
    audio = torch.randn(B, T_A, AUDIO_D)
    video = torch.randn(B, T_V, VIDEO_D)
    with torch.no_grad():
        ref_logits = ref(audio, video).numpy()

    model = MultimodalClassifier(
        modalities=("audio", "video"),
        encoder_configs={
            "audio": {"type": "sequence", "input_dim": AUDIO_D,
                      "encoder_type": "lstm", "hidden_dim": HID,
                      "num_layers": 2, "dropout": 0.0},
            "video": {"type": "frame", "input_dim": VIDEO_D,
                      "hidden_dim": HID, "dropout": 0.0},
        },
        num_classes=C, output_dim=OUT_D, hidden_dim=HEAD_H, dropout=0.0,
    )
    feats = {
        "audio": jnp.asarray(audio.numpy()),
        "video": jnp.asarray(video.numpy()),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
    template = dict(variables)["params"]

    imported = import_reference_state_dict(
        ref.reference_state_dict(), template
    )
    ours = model.apply({"params": imported}, feats, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               rtol=1e-4, atol=2e-5)


def test_import_cnn_batchnorm_running_stats():
    """A trained cnn encoder's BN running_mean/running_var must transfer:
    eval-mode logits match torch only if the stats are imported, not the
    init-time zeros/ones."""
    import sys
    import types

    for name in ("torchvision", "torchvision.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, "/root/reference/src")
    import encoders as ref_encoders

    from multimodal_emotion_detection_tpu.models.encoders import (
        SequenceEncoder,
    )
    from multimodal_emotion_detection_tpu.utils.torch_import import (
        import_reference_state_dict,
    )

    torch.manual_seed(0)
    ref = ref_encoders.SequenceEncoder(
        input_dim=12, hidden_dim=128, output_dim=16, num_layers=2,
        encoder_type="cnn", dropout=0.0,
    )
    # simulate training: push the running stats away from (0, 1)
    with torch.no_grad():
        for bn in (ref.bn1, ref.bn2):
            bn.running_mean.uniform_(-1.0, 1.0)
            bn.running_var.uniform_(0.5, 2.0)
    ref.eval()

    x = np.random.RandomState(1).randn(4, 20, 12).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x)).numpy()

    ours = SequenceEncoder(input_dim=12, hidden_dim=128, output_dim=16,
                           num_layers=2, encoder_type="cnn", dropout=0.0)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {f"encoders.audio.{k}": t for k, t in ref.state_dict().items()}
    params, batch_stats = import_reference_state_dict(
        sd,
        {"audio_encoder": dict(variables["params"])},
        template_batch_stats={
            "audio_encoder": dict(variables["batch_stats"]),
        },
    )
    out_j = ours.apply(
        {"params": params["audio_encoder"],
         "batch_stats": batch_stats["audio_encoder"]},
        jnp.asarray(x), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)

    # without the stats the eval forward must NOT match (guards against
    # the import silently becoming a no-op)
    out_bad = ours.apply(
        {"params": params["audio_encoder"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), deterministic=True,
    )
    assert np.abs(np.asarray(out_bad) - out_t).max() > 1e-3


def test_import_gru_biases_kept_separate():
    """GRU import must NOT fuse biases (reset gate applies inside)."""
    torch.manual_seed(1)
    rnn = torch.nn.GRU(AUDIO_D, HID, num_layers=1, batch_first=True)
    proj = torch.nn.Linear(HID, OUT_D)
    sd = {}
    for key, value in rnn.state_dict().items():
        sd[f"encoders.audio.rnn.{key}"] = value
    for key, value in proj.state_dict().items():
        sd[f"encoders.audio.projection.{key}"] = value

    from multimodal_emotion_detection_tpu.models.encoders import (
        SequenceEncoder,
    )

    enc = SequenceEncoder(input_dim=AUDIO_D, hidden_dim=HID,
                          output_dim=OUT_D, encoder_type="gru", num_layers=1)
    x = torch.randn(B, T_A, AUDIO_D)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0),
                                  jnp.asarray(x.numpy()))
    template = {"audio_encoder": dict(variables)["params"]}
    imported = import_reference_state_dict(sd, template,
                                           modalities=("audio",))
    with torch.no_grad():
        _, h_n = rnn(x)
        ref_out = proj(h_n[-1]).numpy()
    ours = enc.apply({"params": imported["audio_encoder"]},
                     jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref_out,
                               rtol=1e-4, atol=2e-5)
