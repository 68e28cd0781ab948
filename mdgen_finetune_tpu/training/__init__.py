from .trainer import Trainer, TrainState

__all__ = ["Trainer", "TrainState"]
