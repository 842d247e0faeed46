"""Sharded hyperparameter-search restarts (SURVEY.md C16).

LML evaluations / gradient-ascent restarts are embarrassingly parallel over
candidate hyperparameters: vmap over the candidate batch, shard the batch
axis over the ``restart`` mesh axis, replicate the data. The reference runs
its BO candidate evaluations serially in Python
[ref: tune_hyperparms_regression.py:355-357, CO2_example.py:350-357].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_process_tpu.gp import regression as _reg
from gaussian_process_tpu.opt import gradient as _grad
from gaussian_process_tpu.ops import kernels as _k


def sharded_lml(
    kernel: _k.Kernel,
    params_batch: _k.Params,  # pytree with leading batch dim on every leaf
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "restart",
    noise_variance: float = 5e-4,
    dist_method: str = "dot",
) -> jnp.ndarray:
    """LML for a batch of hyperparameter candidates, sharded over ``axis``.

    Batch size must divide the axis size (pad candidates if needed).
    """
    batch_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    params_batch = jax.device_put(params_batch, batch_sharding)
    x = jax.device_put(x, rep)
    y = jax.device_put(y, rep)

    fn = jax.jit(
        jax.vmap(
            lambda p: _reg.log_marginal_likelihood(
                kernel, p, x, y, noise_variance=noise_variance, dist_method=dist_method
            )
        ),
        out_shardings=batch_sharding,
    )
    return fn(params_batch)


def sharded_gradient_restarts(
    kernel: _k.Kernel,
    params_batch: _k.Params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "restart",
    noise_variance: float = 5e-4,
    learning_rate: float = 0.01,
    tol: float = 1e-3,
    max_iters: int = 1000,
    optimizer: str = "adam",
    transform: str = "log",
    trainable=None,
):
    """Run gradient-ascent LML maximisation from many random initialisations
    at once, sharded over the restart axis; returns the per-restart results
    (params, lml, iters, converged). Pick the argmax downstream."""
    batch_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    params_batch = jax.device_put(params_batch, batch_sharding)
    x = jax.device_put(x, rep)
    y = jax.device_put(y, rep)

    def one(p):
        res = _grad.tune_gradient_ascent(
            kernel,
            p,
            x,
            y,
            noise_variance=noise_variance,
            learning_rate=learning_rate,
            tol=tol,
            max_iters=max_iters,
            optimizer=optimizer,
            transform=transform,
            trainable=trainable,
        )
        return res.params, res.lml, res.iters, res.converged

    return jax.jit(jax.vmap(one))(params_batch)


def best_restart(params_batch, lml: jnp.ndarray):
    """argmax-selects the winning restart's params (host-side convenience)."""
    i = int(jnp.argmax(lml))
    return jax.tree_util.tree_map(lambda l: l[i], params_batch), float(lml[i])
