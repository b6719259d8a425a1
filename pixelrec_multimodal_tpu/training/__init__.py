"""Training layer: optimizers/schedules, compiled steps, host orchestration."""
from .e2e_steps import init_e2e_train_state, make_e2e_step_fns  # noqa: F401
from .optimizers import (  # noqa: F401
    LRScheduler,
    build_optimizer,
    with_frozen,
)
from .steps import TrainState, init_train_state, make_step_fns  # noqa: F401
from .trainer import Trainer  # noqa: F401
