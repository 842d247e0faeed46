"""Nyström preconditioner for large-n kernel CG solves.

Plain Jacobi-preconditioned CG stalls on dense RBF systems at n ~ 100k:
the kernel's top eigenvalue grows O(n) while the noise floor stays at
s = 1e-2, so kappa ~ 1e5-1e6 and the residual barely moves (measured on
v5e: ||r|| 241 -> 192 after 100 iterations at n = 102400). The standard
fix ("Preconditioning Kernel Matrices", PAPERS.md) is a low-rank spectral
preconditioner: approximate K by its Nyström projection onto r landmark
points and invert that approximation exactly via Woodbury.

    K  ~=  U U^T,     U = K_nm L_mm^{-T}   (n x r),   K_mm = L_mm L_mm^T
    P   =  U U^T + s I
    P^{-1} v = (v - U (s I_r + U^T U)^{-1} U^T v) / s

Setup is O(n r^2 + r^3) FLOPs and O(n r) memory — trivial next to one
kernel matvec — and each application is two (n x r) GEMMs. The
preconditioned system's condition number drops to roughly
(lambda_{r+1}(K) + s) / s, which for fast-decaying RBF spectra turns
hundreds of stalled iterations into tens of converging ones.

No reference equivalent (the reference never solves beyond dense Cholesky,
[ref: GP_regression.py:138]); this powers the framework's n = 100k path
(BASELINE.md row 2).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from gaussian_process_tpu.linalg import cholesky as _chol
from gaussian_process_tpu.ops import kernels as _k


class NystromPreconditioner(NamedTuple):
    U: jnp.ndarray  # (n, r) Nystrom factor K_nm L_mm^{-T}
    chol_G: jnp.ndarray  # (r, r) chol(s I + U^T U)
    shift: jnp.ndarray  # scalar s
    landmarks: jnp.ndarray  # (r,) landmark indices into x

    def apply(self, v: jnp.ndarray) -> jnp.ndarray:
        """P^{-1} v via Woodbury; v is (n,) or (n, k)."""
        vec = v.ndim == 1
        vv = v[:, None] if vec else v
        w = jnp.dot(
            self.U.T, vv, preferred_element_type=vv.dtype,
            precision=lax.Precision.HIGHEST,
        )
        z = _chol.cholesky_solve(self.chol_G, w)
        out = (vv - jnp.dot(
            self.U, z, preferred_element_type=vv.dtype,
            precision=lax.Precision.HIGHEST,
        )) / self.shift
        return out[:, 0] if vec else out


def make_nystrom_preconditioner(
    kernel: _k.Kernel,
    params: _k.Params,
    x: jnp.ndarray,
    *,
    shift,
    rank: int = 512,
    key: Optional[jax.Array] = None,
    jitter: float = 1e-6,
    row_chunk: Optional[int] = None,
) -> NystromPreconditioner:
    """Build the rank-``rank`` Nyström preconditioner for K(x, x) + shift I.

    ``kernel``/``params`` must be the white-free kernel (the caller folds
    White variance into ``shift``, as the CG solvers already do).
    Landmarks are a uniform random subset (``key=None`` -> evenly strided
    subset, deterministic).

    ``row_chunk``: build U in ``lax.scan`` row blocks of this size. The
    dense build holds K_nm, its transpose, the TRSM result AND U
    simultaneously (4x n*r floats — measured r4: rank 2048 at n = 204800
    OOMs 16 GB HBM as a standalone program even though U itself is only
    1.7 GB); the chunked build's workspace is O(row_chunk * rank) beside
    the U output, at the cost of applying an explicit L_mm^{-T} as a GEMM
    per chunk (preconditioner-quality arithmetic — CG corrects any
    rounding). "auto"/None: chunk at 65536 rows when n * r would exceed
    ~2^28 floats, else the dense build.
    """
    U, G, idx = make_nystrom_factor(
        kernel, params, x, rank=rank, key=key, jitter=jitter,
        row_chunk=row_chunk,
    )
    G = G + jnp.asarray(shift, U.dtype) * jnp.eye(G.shape[0], dtype=U.dtype)
    chol_G = _chol.safe_cholesky(G).factor
    return NystromPreconditioner(
        U=U,
        chol_G=chol_G,
        shift=jnp.asarray(shift, U.dtype),
        landmarks=idx,
    )


def make_nystrom_factor(
    kernel: _k.Kernel,
    params: _k.Params,
    x: jnp.ndarray,
    *,
    rank: int = 512,
    key: Optional[jax.Array] = None,
    jitter: float = 1e-6,
    row_chunk: Optional[int] = None,
):
    """The bare rank-``rank`` Nyström factor of K(x, x): returns
    ``(U, G, landmarks)`` with K ~= U U^T and G = U^T U (r, r).

    Shared by :func:`make_nystrom_preconditioner` (which shifts G and
    factorizes) and consumers that re-weight U per outer iteration — the
    Laplace classifier preconditions B = I + sW K sW with
    I + (sW U)(sW U)^T, rebuilding only the (r, r) Gram each Newton step
    while U is computed once (gp/classification.py, r5).
    """
    x = _k._dist._as_2d(x)
    n = x.shape[0]
    r = min(rank, n)
    if key is None:
        idx = (jnp.arange(r) * (n // r)).astype(jnp.int32)
    else:
        idx = jax.random.choice(key, n, shape=(r,), replace=False)
    z = x[idx]

    K_mm = _k.gram(kernel, params, z)
    # relative jitter keeps chol(K_mm) sane when landmarks nearly coincide
    res = _chol.safe_cholesky(K_mm, initial_jitter=jitter)

    if row_chunk is None and n * r > (1 << 28):
        row_chunk = 65536
    if row_chunk is not None and n > row_chunk:
        c = int(row_chunk)
        n_pad = -(-n // c) * c
        x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        valid = (jnp.arange(n_pad) < n).reshape(n_pad // c, c)
        xb = x_pad.reshape(n_pad // c, c, x.shape[1])
        Wt = lax.linalg.triangular_solve(
            res.factor, jnp.eye(r, dtype=x.dtype), left_side=True, lower=True
        ).T  # L_mm^{-T} (r, r)

        def body(G_acc, inp):
            x_c, m_c = inp
            Kc = _k.gram(kernel, params, x_c, z)  # (c, r)
            Uc = jnp.dot(
                Kc, Wt, preferred_element_type=x.dtype,
                precision=lax.Precision.HIGHEST,
            )
            Uc = jnp.where(m_c[:, None], Uc, 0.0)
            G_acc = G_acc + jnp.dot(
                Uc.T, Uc, preferred_element_type=x.dtype,
                precision=lax.Precision.HIGHEST,
            )
            return G_acc, Uc

        G, U_blocks = lax.scan(body, jnp.zeros((r, r), x.dtype), (xb, valid))
        U = U_blocks.reshape(n_pad, r)[:n]
    else:
        K_nm = _k.gram(kernel, params, x, z)  # (n, r)
        # U = K_nm L_mm^{-T}  <=>  U^T = L_mm^{-1} K_nm^T
        Ut = lax.linalg.triangular_solve(
            res.factor, K_nm.T, left_side=True, lower=True
        )
        U = Ut.T
        G = jnp.dot(
            Ut, U, preferred_element_type=U.dtype,
            precision=lax.Precision.HIGHEST,
        )
    return U, G, idx
