from multimodal_emotion_detection_tpu.models.encoders import (  # noqa: F401
    FrameEncoder,
    ImageCNNEncoder,
    SequenceEncoder,
    SimpleMLPEncoder,
    build_encoder,
)
from multimodal_emotion_detection_tpu.models.attention import (  # noqa: F401
    CrossModalAttention,
    PairwiseModalityAttention,
    TemporalAttention,
    visualize_attention,
)
from multimodal_emotion_detection_tpu.models.fusion import (  # noqa: F401
    EarlyFusion,
    HybridFusion,
    LateFusion,
    LateFusionWithUncertainty,
    build_fusion_model,
    uncertainty_weighted_fusion,
)
from multimodal_emotion_detection_tpu.models.classifier import (  # noqa: F401
    MultimodalClassifier,
    classifier_from_config,
)
