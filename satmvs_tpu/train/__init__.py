"""Training layer (reference L5): config, loops, metrics, checkpoints, logging."""

from .config import Config  # noqa: F401
from .loop import (  # noqa: F401
    TrainState,
    create_model_and_state,
    fit,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
