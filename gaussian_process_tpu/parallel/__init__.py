"""Multi-chip scale-out: mesh, sharded kernel blocks, distributed solves."""

from gaussian_process_tpu.parallel.mesh import (
    make_mesh,
    shard_rows,
    replicated,
    pad_to_multiple,
)
from gaussian_process_tpu.parallel.kernel_blocks import sharded_gram, ring_matvec
from gaussian_process_tpu.parallel.cg import (
    distributed_posterior_mean_cg,
    make_posterior_mean_cg,
    distributed_posterior_cg,
    make_posterior_cg,
    make_posterior_cg_segments,
    distributed_posterior_cg_segmented,
)
from gaussian_process_tpu.parallel.classification import (
    make_laplace_fit as make_distributed_laplace_fit,
    make_laplace_predict as make_distributed_laplace_predict,
    distributed_fit_predict_binary,
)
from gaussian_process_tpu.parallel.cholesky import (
    distributed_cholesky,
    distributed_cholesky_solve,
    make_distributed_posterior,
    distributed_posterior,
)
from gaussian_process_tpu.parallel.restarts import (
    sharded_lml,
    make_sharded_lml,
    sharded_gradient_restarts,
    make_sharded_gradient_restarts,
    best_restart,
)
from gaussian_process_tpu.parallel.multiclass import (
    fit_multiclass_sharded,
    make_sharded_multiclass_fit,
)
from gaussian_process_tpu.parallel.recovery import (
    run_with_redispatch,
    RedispatchResult,
)
from gaussian_process_tpu.parallel import multihost

__all__ = [
    "make_mesh",
    "shard_rows",
    "replicated",
    "pad_to_multiple",
    "sharded_gram",
    "ring_matvec",
    "distributed_posterior_mean_cg",
    "make_posterior_mean_cg",
    "distributed_posterior_cg",
    "make_posterior_cg",
    "make_posterior_cg_segments",
    "distributed_posterior_cg_segmented",
    "make_distributed_laplace_fit",
    "make_distributed_laplace_predict",
    "distributed_fit_predict_binary",
    "distributed_cholesky",
    "distributed_cholesky_solve",
    "make_distributed_posterior",
    "distributed_posterior",
    "sharded_lml",
    "make_sharded_lml",
    "sharded_gradient_restarts",
    "make_sharded_gradient_restarts",
    "best_restart",
    "fit_multiclass_sharded",
    "make_sharded_multiclass_fit",
    "run_with_redispatch",
    "RedispatchResult",
    "multihost",
]
