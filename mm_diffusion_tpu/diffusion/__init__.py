from .schedules import (
    ScheduleTables,
    betas_for_alpha_bar,
    get_named_beta_schedule,
    make_schedule,
    respace_betas,
    space_timesteps,
    tables_from_betas,
)
from .gaussian import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    mean_flat,
    normal_kl,
    discretized_gaussian_log_likelihood,
    tree_randn_like,
)

__all__ = [
    "ScheduleTables",
    "betas_for_alpha_bar",
    "get_named_beta_schedule",
    "make_schedule",
    "respace_betas",
    "space_timesteps",
    "tables_from_betas",
    "GaussianDiffusion",
    "LossType",
    "ModelMeanType",
    "ModelVarType",
    "mean_flat",
    "normal_kl",
    "discretized_gaussian_log_likelihood",
    "tree_randn_like",
]
