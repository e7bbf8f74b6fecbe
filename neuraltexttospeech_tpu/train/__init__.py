"""Shared training engine: optimizers, functional train state, orbax
checkpoint/resume, and the generic pjit data-parallel Trainer."""

from .checkpoint import Checkpointer
from .harness import Trainer, TrainerConfig, build_state
from .state import OptimizerConfig, TrainState, make_optimizer

__all__ = ["Checkpointer", "Trainer", "TrainerConfig", "build_state",
           "OptimizerConfig", "TrainState", "make_optimizer"]
