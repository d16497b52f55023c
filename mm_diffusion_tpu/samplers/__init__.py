from .ancestral import (
    conditional_p_sample_loop,
    ddim_reverse_loop,
    ddim_sample_loop,
    p_sample_loop,
    p_sample_loop_diverse,
)
from .dpm import DPMSolver, NoiseScheduleVP, model_input_time, wrap_model

__all__ = [
    "conditional_p_sample_loop",
    "ddim_reverse_loop",
    "ddim_sample_loop",
    "p_sample_loop",
    "p_sample_loop_diverse",
    "DPMSolver",
    "NoiseScheduleVP",
    "model_input_time",
    "wrap_model",
]
