"""Hyperparameter optimisation: LML gradient ascent and Bayesian optimisation."""

from gaussian_process_tpu.opt.gradient import (
    GradientResult,
    tune_gradient_ascent,
    log_params,
    exp_params,
)
from gaussian_process_tpu.opt.bo import (
    BOResult,
    tune_bayesian_opt,
    dedup_candidates,
    acquisition_pi,
    acquisition_ei,
    acquisition_ucb,
    acquisition_ts,
)

__all__ = [
    "GradientResult",
    "tune_gradient_ascent",
    "log_params",
    "exp_params",
    "BOResult",
    "tune_bayesian_opt",
    "dedup_candidates",
    "acquisition_pi",
    "acquisition_ei",
    "acquisition_ucb",
    "acquisition_ts",
]
