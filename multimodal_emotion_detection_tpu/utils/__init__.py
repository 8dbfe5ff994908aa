from multimodal_emotion_detection_tpu.utils.prng import key_seq, split_like  # noqa: F401
from multimodal_emotion_detection_tpu.utils.tree import (  # noqa: F401
    count_params,
    param_summary,
)
