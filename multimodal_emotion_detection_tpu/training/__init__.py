from multimodal_emotion_detection_tpu.training.loop import Trainer  # noqa: F401
from multimodal_emotion_detection_tpu.training.steps import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_forward_fn,
    make_train_step,
)
from multimodal_emotion_detection_tpu.training.optim import (  # noqa: F401
    build_optimizer,
    lr_schedule,
)
