"""Kernel-matrix construction primitives (XLA + Pallas TPU)."""

from gaussian_process_tpu.ops.distance import sqdist, absdist
from gaussian_process_tpu.ops.kernels import (
    RBF,
    Linear,
    Matern,
    Periodic,
    DecayedPeriodic,
    RationalQuadratic,
    White,
    Sum,
    Product,
    Scaled,
    gram,
    gram_diag,
    co2_kernel,
    co2_params_from_vector,
    co2_vector_from_params,
)

__all__ = [
    "sqdist",
    "absdist",
    "RBF",
    "Linear",
    "Matern",
    "Periodic",
    "DecayedPeriodic",
    "RationalQuadratic",
    "White",
    "Sum",
    "Product",
    "Scaled",
    "gram",
    "gram_diag",
    "co2_kernel",
    "co2_params_from_vector",
    "co2_vector_from_params",
]
