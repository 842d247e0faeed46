"""Distributed conjugate-gradient GP solves over a device mesh (SURVEY.md C14).

The whole CG iteration runs *inside* ``shard_map``: vectors stay row-sharded,
the matvec is the ring kernel matvec (kernel_blocks.ring_matvec's local body),
and inner products reduce with ``psum`` over ICI. One jitted program; no host
round-trips per iteration.

No reference equivalent (single-chip ``np.linalg`` everywhere,
e.g. [ref: GP_regression.py:138]).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_process_tpu.linalg import cg as _cg
from gaussian_process_tpu.ops import kernels as _k


def _auto_block(k_nw, p_nw, dist_method, tol=1e-6):
    """Per-ring-step kernel block matvec K(x_local, xb) @ vb.

    On TPU with a stationary kernel this is the fused Pallas ``gram_matvec``
    (the block is computed tile-by-tile in VMEM and never written to HBM);
    elsewhere (CPU parity tests, non-stationary kernels) the dense XLA gram.
    ``tol`` picks the output-dot precision: below 1e-5 the 3-pass bf16
    split's ~1.5e-5 floor would lie to the CG residual (ADVICE r4).
    """
    if jax.default_backend() == "tpu" and _k.is_stationary(k_nw):
        from gaussian_process_tpu.ops import pallas as _pops

        _dm = "highest" if tol < 1e-5 else "split3"
        return lambda xl, xb, vb: _pops.gram_matvec(
            k_nw, p_nw, xl, xb, vb, dot_mode=_dm
        )

    def _xla(xl, xb, vb):
        return _k.gram(k_nw, p_nw, xl, xb, method=dist_method) @ vb

    return _xla


def make_posterior_mean_cg(
    kernel: _k.Kernel,
    *,
    mesh: Mesh,
    axis: str = "data",
    noise_variance: float = 5e-4,
    tol: float = 1e-6,
    max_iters: int = 1000,
    dist_method: str = "dot",
    block_fn=None,
    n_true: Optional[int] = None,
):
    """Build a jitted distributed solver ``(params, x, y, x_test) ->
    (mean, alpha, iters, resnorm)``.

    Hyperparameters ``params`` are a traced argument, so one compiled program
    serves a whole hyperparameter search; repeat calls hit the jit cache
    (unlike re-closing over params each call, which re-traces every time).

    ``n_true``: when the inputs were padded to divide the mesh axis
    (mesh.pad_to_multiple), masking keeps the padded coordinates exactly
    inert — zero RHS entries plus a masked matvec mean they never enter the
    Krylov space.
    """

    def fn(params, x_local, y_local, x_test_rep):
        k_nw, p_nw, white_var = _k.split_white(kernel, params)
        diag_shift = noise_variance + (white_var if white_var is not None else 0.0)
        m_local = x_local.shape[0]
        me = lax.axis_index(axis)
        n_pad_total = m_local * lax.axis_size(axis)
        if n_true is not None and n_true != n_pad_total:
            valid = (me * m_local + jnp.arange(m_local)) < n_true
            y_local = jnp.where(valid, y_local, 0.0)
        else:
            valid = None
        _block = block_fn if block_fn is not None else _auto_block(
            k_nw, p_nw, dist_method, tol
        )

        p = lax.axis_size(axis)
        perm = [(i, (i + 1) % p) for i in range(p)]

        def matvec(v_local):
            def body(step, carry):
                xb, vb, acc = carry
                acc = acc + _block(x_local, xb, vb)
                xb = lax.ppermute(xb, axis, perm)
                vb = lax.ppermute(vb, axis, perm)
                return xb, vb, acc

            acc0 = jnp.zeros_like(v_local)
            _, _, acc = lax.fori_loop(0, p, body, (x_local, v_local, acc0))
            out = acc + diag_shift * v_local
            if valid is not None:
                # padded coordinates stay out of the Krylov space
                out = jnp.where(valid, out, 0.0) if out.ndim == 1 else jnp.where(
                    valid[:, None], out, 0.0
                )
            return out

        pdot = lambda u, v: lax.psum(jnp.sum(u * v, axis=0), axis)
        prior_diag = _k.gram_diag(k_nw, p_nw, x_local) + diag_shift
        state = _cg.cg_solve(
            matvec,
            y_local,
            tol=tol,
            max_iters=max_iters,
            precond_diag=prior_diag,
            dot=pdot,
        )
        # cross term: mu* = sum over shards of K(x_test, x_local) @ alpha_local
        mean_local = _k.gram(k_nw, p_nw, x_test_rep, x_local, method=dist_method) @ state.x
        mean = lax.psum(mean_local, axis)
        return mean, state.x, state.iters, state.resnorm

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def distributed_posterior_mean_cg(
    kernel: _k.Kernel,
    params: _k.Params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_test: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "data",
    noise_variance: float = 5e-4,
    tol: float = 1e-6,
    max_iters: int = 1000,
    dist_method: str = "dot",
    block_fn=None,
):
    """One-shot convenience over :func:`make_posterior_mean_cg`.

    x, y row-sharded over ``axis``; x_test replicated. Returns
    (mean (replicated), alpha (sharded), iters, resnorm). For repeated solves
    (benchmarks, hyperparameter sweeps) build the solver once with
    :func:`make_posterior_mean_cg` to reuse the compiled program.

    Accepts arbitrary n: inputs are padded to a multiple of the mesh axis
    and the padding masked out inside the SPMD program.
    """
    from gaussian_process_tpu.parallel import mesh as _mesh

    p = mesh.shape[axis]
    n = x.shape[0]
    x_p, _ = _mesh.pad_to_multiple(x, p)
    y_p, _ = _mesh.pad_to_multiple(y, p)
    solver = make_posterior_mean_cg(
        kernel,
        mesh=mesh,
        axis=axis,
        noise_variance=noise_variance,
        tol=tol,
        max_iters=max_iters,
        dist_method=dist_method,
        block_fn=block_fn,
        n_true=None if x_p.shape[0] == n else n,
    )
    return solver(params, x_p, y_p, x_test)


def make_posterior_cg(
    kernel: _k.Kernel,
    *,
    mesh: Mesh,
    axis: str = "data",
    noise_variance: float = 5e-4,
    tol: float = 1e-6,
    max_iters: int = 1000,
    dist_method: str = "dot",
    block_fn=None,
    n_true: Optional[int] = None,
):
    """Distributed matrix-free posterior with MEAN AND VARIANCE.

    The distributed counterpart of ``gp.posterior_cg`` (the v = L \\ K_s
    variance of Alg. 2.1 [ref: GP_regression.py:144-147] with the
    triangular solve replaced by one block-CG solve): the RHS block
    [y | K_s] is row-sharded like everything else, every test column rides
    the same ring kernel matvec per iteration, and the variance reduces
    with one psum. Returns ``(params, x_local, y_local, x_test_rep) ->
    (mean, var, alpha_local, iters, resnorm)``.
    """

    def fn(params, x_local, y_local, x_test_rep):
        k_nw, p_nw, white_var = _k.split_white(kernel, params)
        diag_shift = noise_variance + (white_var if white_var is not None else 0.0)
        m_local = x_local.shape[0]
        me = lax.axis_index(axis)
        n_pad_total = m_local * lax.axis_size(axis)
        if n_true is not None and n_true != n_pad_total:
            valid = (me * m_local + jnp.arange(m_local)) < n_true
            y_local = jnp.where(valid, y_local, 0.0)
        else:
            valid = None
        _block = block_fn if block_fn is not None else _auto_block(
            k_nw, p_nw, dist_method, tol
        )

        p = lax.axis_size(axis)
        perm = [(i, (i + 1) % p) for i in range(p)]

        def matvec(v_local):
            def body(step, carry):
                xb, vb, acc = carry
                acc = acc + _block(x_local, xb, vb)
                xb = lax.ppermute(xb, axis, perm)
                vb = lax.ppermute(vb, axis, perm)
                return xb, vb, acc

            acc0 = jnp.zeros_like(v_local)
            _, _, acc = lax.fori_loop(0, p, body, (x_local, v_local, acc0))
            out = acc + diag_shift * v_local
            if valid is not None:
                out = jnp.where(valid[:, None], out, 0.0)
            return out

        with jax.named_scope("dist.cg_block_solve"):
            Ks_local = _k.gram(k_nw, p_nw, x_local, x_test_rep, method=dist_method)
            if valid is not None:
                Ks_local = jnp.where(valid[:, None], Ks_local, 0.0)
            rhs = jnp.concatenate([y_local[:, None], Ks_local], axis=1)
            pdot = lambda u, v: lax.psum(jnp.sum(u * v, axis=0), axis)
            prior_diag = (_k.gram_diag(k_nw, p_nw, x_local) + diag_shift)[:, None]
            state = _cg.cg_solve(
                matvec,
                rhs,
                tol=tol,
                max_iters=max_iters,
                precond_diag=prior_diag[:, 0],
                dot=pdot,
            )
            alpha_local = state.x[:, 0]
            U = state.x[:, 1:]

        with jax.named_scope("dist.cg_predict"):
            mean = lax.psum(Ks_local.T @ alpha_local, axis)
            kss = _k.gram_diag(kernel, params, x_test_rep)
            var = jnp.maximum(
                kss - lax.psum(jnp.sum(Ks_local * U, axis=0), axis), 0.0
            )
        return mean, var, alpha_local, state.iters, state.resnorm

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P(), P(axis), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def distributed_posterior_cg(
    kernel: _k.Kernel,
    params: _k.Params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_test: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "data",
    noise_variance: float = 5e-4,
    tol: float = 1e-6,
    max_iters: int = 1000,
    dist_method: str = "dot",
    block_fn=None,
):
    """One-shot convenience over :func:`make_posterior_cg` (mean AND
    variance); pads arbitrary n and masks the padding."""
    from gaussian_process_tpu.parallel import mesh as _mesh

    p = mesh.shape[axis]
    n = x.shape[0]
    x_p, _ = _mesh.pad_to_multiple(x, p)
    y_p, _ = _mesh.pad_to_multiple(y, p)
    solver = make_posterior_cg(
        kernel,
        mesh=mesh,
        axis=axis,
        noise_variance=noise_variance,
        tol=tol,
        max_iters=max_iters,
        dist_method=dist_method,
        block_fn=block_fn,
        n_true=None if x_p.shape[0] == n else n,
    )
    return solver(params, x_p, y_p, x_test)
