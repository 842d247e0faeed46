"""GP inference algorithms: exact regression and Laplace classification."""

from gaussian_process_tpu.gp.regression import (
    Posterior,
    posterior,
    log_marginal_likelihood,
    sample_prior,
    sample_posterior,
    posterior_mean_cg,
    posterior_cg,
    posterior_cg_segmented,
    SegmentedSnapshot,
    CGPosterior,
)

from gaussian_process_tpu.gp.whitened import (
    WhitenedPosterior,
    whitened_posterior,
    whitened_lml,
    make_whitened_lml_fn,
)
from gaussian_process_tpu.gp.classification import (
    BinaryLaplaceState,
    BinaryLaplaceCGState,
    BinaryPrediction,
    laplace_fit,
    laplace_fit_cg,
    laplace_predict,
    fit_binary,
    predict_binary,
    predict_binary_cg,
)
from gaussian_process_tpu.gp.multiclass import (
    MulticlassLaplaceState,
    MulticlassPrediction,
    laplace_fit_multiclass,
    laplace_predict_multiclass,
    one_hot_targets,
    fit_multiclass,
    predict_multiclass,
)

__all__ = [
    "Posterior",
    "posterior",
    "log_marginal_likelihood",
    "sample_prior",
    "sample_posterior",
    "posterior_mean_cg",
    "posterior_cg",
    "posterior_cg_segmented",
    "SegmentedSnapshot",
    "CGPosterior",
    "WhitenedPosterior",
    "whitened_posterior",
    "whitened_lml",
    "make_whitened_lml_fn",
    "BinaryLaplaceState",
    "BinaryLaplaceCGState",
    "BinaryPrediction",
    "laplace_fit",
    "laplace_fit_cg",
    "laplace_predict",
    "fit_binary",
    "predict_binary",
    "predict_binary_cg",
    "MulticlassLaplaceState",
    "MulticlassPrediction",
    "laplace_fit_multiclass",
    "laplace_predict_multiclass",
    "one_hot_targets",
    "fit_multiclass",
    "predict_multiclass",
]
