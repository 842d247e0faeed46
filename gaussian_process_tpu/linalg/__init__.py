"""Dense and iterative linear algebra for GP solves."""

from gaussian_process_tpu.linalg.cholesky import (
    safe_cholesky,
    cholesky_solve,
    tri_solve,
    logdet_from_chol,
    CholeskyResult,
)
from gaussian_process_tpu.linalg.cg import cg_solve, CGState

__all__ = [
    "safe_cholesky",
    "cholesky_solve",
    "tri_solve",
    "logdet_from_chol",
    "CholeskyResult",
    "cg_solve",
    "CGState",
]
