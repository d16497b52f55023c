from .resample import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from .state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    quartile_metrics,
)
from .loop import TrainLoop, parse_ema_rates
from .optimization import SCHEDULES, bert_adam
from . import checkpoint

__all__ = [
    "LossSecondMomentResampler",
    "UniformSampler",
    "create_named_schedule_sampler",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "quartile_metrics",
    "TrainLoop",
    "SCHEDULES",
    "bert_adam",
    "parse_ema_rates",
    "checkpoint",
]
