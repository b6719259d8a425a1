"""Training layer: optimizers/schedules, compiled steps, host orchestration."""
from .optimizers import LRScheduler, build_optimizer  # noqa: F401
from .steps import TrainState, init_train_state, make_step_fns  # noqa: F401
from .trainer import Trainer  # noqa: F401
