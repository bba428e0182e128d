from videocad_tpu.train.objective import (  # noqa: F401
    REFERENCE_CMD_WEIGHTS,
    LossConfig,
    compute_loss_and_metrics,
)
from videocad_tpu.train.metrics import init_metrics, update_metrics  # noqa: F401
from videocad_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
)
from videocad_tpu.train.steps import (  # noqa: F401
    add_action_noise,
    make_eval_step,
    make_train_step,
    prepare_model_inputs,
)
from videocad_tpu.train.trainer import Trainer  # noqa: F401
from videocad_tpu.train.checkpoint import CheckpointHandler  # noqa: F401
from videocad_tpu.train.state import create_sharded_train_state  # noqa: F401
