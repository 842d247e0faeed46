"""Matrix-free preconditioned conjugate gradients.

No reference equivalent — the reference always materialises and factorizes
K densely (e.g. [ref: GP_regression.py:138]), which caps n at what one
host's RAM and O(n^3) tolerate. CG + a matrix-free kernel matvec (see
ops/pallas/matvec and parallel/matvec) is the 100k-point path: K at
n = 100k in f32 is 40 GB and never fits HBM, but K@v streams in tiles.

The well-conditioned setting (the reference always adds noise s = 5e-4 to
the diagonal [ref: GP_regression.py:120]) makes plain Jacobi-preconditioned
CG converge quickly (PAPERS.md: "Preconditioning Kernel Matrices",
"Conjugate Gradients for Kernel Machines").

Runs under jit: fixed-shape ``lax.while_loop`` with a residual-norm stop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
from jax import lax


class CGState(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    p: jnp.ndarray
    z: jnp.ndarray
    rz: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray


def cg_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    *,
    tol: float = 1e-6,
    max_iters: int = 1000,
    precond_diag: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    dot: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = None,
) -> CGState:
    """Solve A x = b for SPD A given only ``matvec`` (x -> A x).

    ``precond_diag``: diag(A) for Jacobi preconditioning (pass None to skip).
    ``dot``: inner product — override with a psum-reducing version when x/b
    are sharded across a mesh axis (parallel/cg.py does this).
    Works on single vectors or (n, k) blocks of RHS (all columns iterate
    until the worst column converges).
    """
    if dot is None:
        dot = lambda u, v: jnp.sum(u * v, axis=0)

    if precond_diag is not None:
        inv_diag = 1.0 / precond_diag
        if b.ndim > 1:
            inv_diag = inv_diag[:, None]
        apply_M = lambda r: r * inv_diag
    else:
        apply_M = lambda r: r

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x) if x0 is not None else b
    z = apply_M(r)
    p = z
    rz = dot(r, z)
    bnorm = jnp.sqrt(jnp.max(dot(b, b)))
    stop = tol * jnp.maximum(bnorm, 1e-30)

    def cond(s: CGState):
        return (s.resnorm > stop) & (s.iters < max_iters)

    def body(s: CGState):
        Ap = matvec(s.p)
        denom = dot(s.p, Ap)
        alpha = s.rz / jnp.where(denom == 0, 1.0, denom)
        x = s.x + alpha * s.p
        r = s.r - alpha * Ap
        z = apply_M(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(s.rz == 0, 1.0, s.rz)
        p = z + beta * s.p
        resnorm = jnp.sqrt(jnp.max(dot(r, r)))
        return CGState(x, r, p, z, rz_new, s.iters + 1, resnorm)

    init = CGState(
        x=x,
        r=r,
        p=p,
        z=z,
        rz=rz,
        iters=jnp.asarray(0),
        resnorm=jnp.sqrt(jnp.max(dot(r, r))),
    )
    return lax.while_loop(cond, body, init)
