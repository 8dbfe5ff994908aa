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
from multimodal_emotion_detection_tpu.ops.logmel import mfcc  # noqa: F401
from multimodal_emotion_detection_tpu.ops.lstm_kernel import (  # noqa: F401
    lstm2_infer_pallas,
)
from multimodal_emotion_detection_tpu.ops.lstm_vjp import (  # noqa: F401
    fused_gru,
    fused_lstm,
)
from multimodal_emotion_detection_tpu.ops.flash_attention import (  # noqa: F401
    attention_reference,
    flash_attention,
)
