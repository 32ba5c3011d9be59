"""Training layer: jitted steps, checkpointing with resume, the Trainer."""

from . import checkpoint  # noqa: F401
from .loop import (  # noqa: F401
    PlateauScheduler,
    TrainState,
    create_train_state,
    make_eval_step,
    make_predict_fn,
    make_train_step,
)
from .trainer import Trainer  # noqa: F401
