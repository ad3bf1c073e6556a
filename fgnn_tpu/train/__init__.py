from .common import (
    Schedules,
    TrainState,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    set_lr,
)

__all__ = [
    "Schedules", "TrainState", "load_checkpoint", "make_optimizer",
    "save_checkpoint", "set_lr",
]
