from .state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_schedule_free_adamw,
    make_schedule_free_radam,
)
from .steps import (  # noqa: F401
    detector_bn_recalib_step,
    detector_eval_step,
    detector_train_step,
    transformer_eval_step,
    transformer_train_step,
)
