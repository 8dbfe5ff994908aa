from multimodal_emotion_detection_tpu.ops.logmel import (  # noqa: F401
    LogMelParams,
    log_mel_spectrogram,
    logmel_frames,
    mel_filterbank,
)
from multimodal_emotion_detection_tpu.ops.resize import (  # noqa: F401
    area_resize,
    bgr_to_gray,
)
