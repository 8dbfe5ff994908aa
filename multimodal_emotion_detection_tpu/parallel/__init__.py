from multimodal_emotion_detection_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_from_config,
)
from multimodal_emotion_detection_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    replicated,
    shard_state,
)
from multimodal_emotion_detection_tpu.parallel.train import (  # noqa: F401
    make_sharded_train_step,
)
from multimodal_emotion_detection_tpu.parallel.vmap_sweep import (  # noqa: F401
    train_ensemble,
    vmapped_lr_sweep,
)
from multimodal_emotion_detection_tpu.parallel.distributed import (  # noqa: F401
    maybe_initialize,
)
