"""GP inference algorithms: exact regression and Laplace classification."""

from gaussian_process_tpu.gp.regression import (
    Posterior,
    posterior,
    log_marginal_likelihood,
    sample_prior,
    sample_posterior,
    posterior_mean_cg,
)

__all__ = [
    "Posterior",
    "posterior",
    "log_marginal_likelihood",
    "sample_prior",
    "sample_posterior",
    "posterior_mean_cg",
]
