"""Hyperparameter optimisation: LML gradient ascent and Bayesian optimisation."""

from gaussian_process_tpu.opt.gradient import (
    GradientResult,
    tune_gradient_ascent,
    log_params,
    exp_params,
)
from gaussian_process_tpu.opt.large_scale import (
    LargeScaleResult,
    lml_surrogate,
    tune_large_scale,
    slq_logdet,
    lml_estimate,
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
    "LargeScaleResult",
    "lml_surrogate",
    "tune_large_scale",
    "slq_logdet",
    "lml_estimate",
    "BOResult",
    "tune_bayesian_opt",
    "dedup_candidates",
    "acquisition_pi",
    "acquisition_ei",
    "acquisition_ucb",
    "acquisition_ts",
]
