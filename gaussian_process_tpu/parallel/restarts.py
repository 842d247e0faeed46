"""Sharded hyperparameter-search restarts (SURVEY.md C16).

LML evaluations / gradient-ascent restarts are embarrassingly parallel over
candidate hyperparameters: each device takes its slice of the candidate batch
and runs a purely local vmap inside ``shard_map`` — zero collectives, so the
compiled program is the single-device program replicated N ways. (Leaving
this to GSPMD sharding propagation instead lets XLA thread data-axis
collectives through the ascent while_loop, a ~100x runtime cliff on emulated
meshes.) The reference runs its BO candidate evaluations serially in Python
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


def _batch_size(params_batch) -> int:
    leaves = jax.tree_util.tree_leaves(params_batch)
    return int(leaves[0].shape[0])


def _shard_batch(mesh: Mesh, axis: str, params_batch):
    """device_put the candidate batch split over ``axis``, data replicated."""
    batch_sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(params_batch, batch_sharding), batch_sharding


def make_sharded_lml(
    kernel: _k.Kernel,
    *,
    mesh: Mesh,
    axis: str = "restart",
    noise_variance: float = 5e-4,
    dist_method: str = "dot",
):
    """Jitted ``(params_batch, x, y) -> lml (batch,)`` with the batch sharded
    over ``axis`` and per-device local vmap (batch must divide the axis size)."""

    def local(params_local, x, y):
        return jax.vmap(
            lambda p: _reg.log_marginal_likelihood(
                kernel, p, x, y, noise_variance=noise_variance, dist_method=dist_method
            )
        )(params_local)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


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

    Batch size must divide the axis size (pad candidates if needed). One-shot
    convenience; build :func:`make_sharded_lml` once for repeated sweeps.
    """
    fn = make_sharded_lml(
        kernel, mesh=mesh, axis=axis, noise_variance=noise_variance,
        dist_method=dist_method,
    )
    params_batch, _ = _shard_batch(mesh, axis, params_batch)
    rep = NamedSharding(mesh, P())
    return fn(params_batch, jax.device_put(x, rep), jax.device_put(y, rep))


def make_sharded_gradient_restarts(
    kernel: _k.Kernel,
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
    """Jitted ``(params_batch, x, y) -> (params, lml, iters, converged)``:
    gradient-ascent LML maximisation from many initialisations at once, the
    candidate batch sharded over ``axis``, the whole ascent loop local to each
    device."""

    def one(p, x, y):
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

    def local(params_local, x, y):
        return jax.vmap(lambda p: one(p, x, y))(params_local)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)


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
    """One-shot convenience over :func:`make_sharded_gradient_restarts`;
    returns the per-restart (params, lml, iters, converged). Pick the argmax
    downstream with :func:`best_restart`."""
    fn = make_sharded_gradient_restarts(
        kernel,
        mesh=mesh,
        axis=axis,
        noise_variance=noise_variance,
        learning_rate=learning_rate,
        tol=tol,
        max_iters=max_iters,
        optimizer=optimizer,
        transform=transform,
        trainable=trainable,
    )
    params_batch, _ = _shard_batch(mesh, axis, params_batch)
    rep = NamedSharding(mesh, P())
    return fn(params_batch, jax.device_put(x, rep), jax.device_put(y, rep))


def best_restart(params_batch, lml: jnp.ndarray):
    """argmax-selects the winning restart's params (host-side convenience)."""
    i = int(jnp.argmax(lml))
    return jax.tree_util.tree_map(lambda l: l[i], params_batch), float(lml[i])
