"""Blocked (panel) Cholesky and triangular solves tuned for the TPU MXU.

XLA's stock ``lax.linalg.cholesky`` on TPU expands to a blocked algorithm
with a small fixed panel, so most of the n^3/3 work runs in narrow GEMMs and
the factorization sits far from MXU peak. Measured on v5e at n = 8192, f32,
slope-timed so fixed dispatch/RTT cost cancels: stock 13.7 ms (13.3 TFLOP/s)
vs this routine at block=512: 10.4 ms (17.6 TFLOP/s) — the production
default via ``cholesky.safe_cholesky`` above MIN_BLOCKED_N. These routines
re-block the same math with a wide panel (default 512) so the trailing
symmetric rank-k update — where almost all the FLOPs are — is one large
square GEMM per panel:

    for each panel k:                      (right-looking, unrolled)
        L_kk     = chol(A_kk)              # small dense factorization
        L_ik     = A_ik L_kk^{-T}          # TRSM, panel-wide RHS
        A_rest  -= L_ik L_ik^T             # SYRK as a single MXU GEMM

``blocked_tri_solve`` applies the same idea to L X = B with many RHS
(the v = L \\ K_s solve of R&W Alg. 2.1 [ref: GP_regression.py:144] at
n_test RHS). Measured outcome (v5e, n=8192, m=2048 RHS): stock XLA TRSM
already runs at ~56 TFLOP/s and the blocked variant is throughput-parity,
so production ``tri_solve`` keeps the stock op; this routine stays (tested)
as the building block the distributed panel solves reuse.

The panel loop is unrolled in Python (shapes shrink per panel, all static),
which XLA compiles into one fused program; panel counts are n/block <= ~32,
so compile time stays modest. Everything is pure jax.numpy — jit/vmap/grad
compose as usual (gradients flow through the slicing and GEMMs; for the
LML path the custom-VJP in ``cholesky.safe_cholesky`` bypasses this anyway).

No reference equivalent: the reference calls ``np.linalg.cholesky`` on the
host [ref: GP_regression.py:138] and never blocks anything.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_BLOCK = 512
# below this size the stock XLA op is already fine and blocking only adds
# launch overhead
MIN_BLOCKED_N = 4096


def _use_pallas_panels(dtype, use_pallas: Optional[bool]) -> bool:
    """Fused Pallas panel factor+inverse (ops/pallas/chol.py): available but
    OFF by default — measured on v5e at n=8192 (slope-timed, RTT-free):
    stock 13.7 ms / blocked-XLA 10.4 ms / blocked-Pallas-panel 12.0 ms.
    The Mosaic per-fori-iteration overhead (~0.6 us x b pivot steps) exceeds
    what the fused panel saves over XLA's already-pipelined small chol+TRSM
    pair. Kept (tested, correct) for architectures where the tradeoff flips.
    f32-only (f64 callers — the CPU parity suite — keep the XLA panel ops)."""
    if use_pallas is None:
        return False
    return use_pallas and dtype == jnp.float32


def _tri_solve_right_lt(A: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """X = A L^{-T} for lower-triangular L (i.e. solve X L^T = A)."""
    return lax.linalg.triangular_solve(
        L, A, left_side=False, lower=True, transpose_a=True
    )


def _tri_inv(L: jnp.ndarray) -> jnp.ndarray:
    """Explicit L^{-1} of a small lower-triangular diagonal block.

    Turning the panel-wide TRSM into a GEMM against L^{-1} is the standard
    GPU/TPU trick (cuSOLVER potrf does the same): the O(b^3/2) inversion is
    negligible at b <= ~1024 and the O(n b^2) application then runs at MXU
    speed. Cholesky diagonal blocks are well-conditioned here (every K
    carries the reference's noise jitter, SURVEY.md Q6), so the stability
    cost vs substitution is far below f32 roundoff of the GEMMs themselves.
    """
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)


def blocked_cholesky(
    K: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
    precision: lax.Precision = lax.Precision.HIGH,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Lower Cholesky factor of PSD ``K`` via wide-panel right-looking
    factorization (MXU-dominant). Semantically identical to
    ``lax.linalg.cholesky`` (NaN on indefinite input), faster at
    n >= 4096 on TPU.

    ``use_pallas=True`` factors (and inverts) each diagonal panel with the
    fused Pallas kernel :func:`ops.pallas.chol.chol_inv_panel` instead of
    the XLA chol + triangular-inverse pair; measured slower on v5e (see
    ``_use_pallas_panels``), so off by default.

    ``precision`` controls the MXU pass count for the SYRK/panel GEMMs:
    HIGH (bf16x3, default) is f32-equivalent for these O(1)-magnitude kernel
    matrices and ~2x the throughput of HIGHEST (bf16x6); never use DEFAULT
    (single-pass bf16) — the factor loses ~3 digits and downstream jitter
    escalation kicks in.
    """
    n = K.shape[-1]
    if K.ndim != 2:
        raise ValueError("blocked_cholesky expects a single (n, n) matrix")
    if n <= max(block, MIN_BLOCKED_N):
        return lax.linalg.cholesky(K)
    pallas_panels = _use_pallas_panels(K.dtype, use_pallas)
    if pallas_panels:
        from gaussian_process_tpu.ops.pallas import chol as _pchol

    dtype = K.dtype
    # column-block panels of the growing factor; assembled at the end
    out_cols = []
    rest = K
    offset = 0
    while n - offset > 0:
        b = min(block, n - offset)
        A_kk = rest[:b, :b]
        A_ik = rest[b:, :b]
        if pallas_panels:
            L_kk, W_kk = _pchol.chol_inv_panel(A_kk)
            inv_T = W_kk.T
        else:
            L_kk = lax.linalg.cholesky(A_kk)
            inv_T = _tri_inv(L_kk).T
        # panel solve as GEMM: A_ik L_kk^{-T} with an explicit small inverse
        L_ik = jnp.dot(
            A_ik,
            inv_T,
            preferred_element_type=dtype,
            precision=precision,
        )
        # trailing SYRK — the FLOP-dominant step, one big square GEMM
        trailing = rest[b:, b:]
        if trailing.shape[0] > 0:
            trailing = trailing - jnp.dot(
                L_ik,
                L_ik.T,
                preferred_element_type=dtype,
                precision=precision,
            )
        col = jnp.concatenate([L_kk, L_ik], axis=0) if L_ik.shape[0] else L_kk
        out_cols.append((offset, col))
        rest = trailing
        offset += b

    L = jnp.zeros_like(K)
    for off, col in out_cols:
        b = col.shape[1]
        L = lax.dynamic_update_slice(L, col, (off, off))
    # zero the upper triangle contributed by the diagonal blocks' chol
    # (lax.linalg.cholesky already returns lower-only, so nothing to mask)
    return L


def blocked_tri_solve(
    L: jnp.ndarray,
    B: jnp.ndarray,
    *,
    trans: bool = False,
    block: int = DEFAULT_BLOCK,
    precision: lax.Precision = lax.Precision.HIGH,
) -> jnp.ndarray:
    """Solve L X = B (or L^T X = B with ``trans``) for lower-triangular L
    with (n, m) RHS, blocked so the off-diagonal updates are GEMMs.

    Forward (trans=False), block rows i = 0..p-1:
        X_i = L_ii^{-1} (B_i - sum_{j<i} L_ij X_j)
    Backward (trans=True) runs block rows in reverse with L_ji^T.
    """
    n = L.shape[-1]
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    if n <= max(block, MIN_BLOCKED_N):
        X = lax.linalg.triangular_solve(
            L, B, left_side=True, lower=True, transpose_a=trans
        )
        return X[:, 0] if vec else X

    # static block boundaries
    bounds = []
    off = 0
    while off < n:
        b = min(block, n - off)
        bounds.append((off, b))
        off += b

    blocks_B = [B[o : o + b] for o, b in bounds]
    X_blocks: list = [None] * len(bounds)
    order = range(len(bounds)) if not trans else range(len(bounds) - 1, -1, -1)
    for i in order:
        oi, bi = bounds[i]
        rhs = blocks_B[i]
        js = range(i) if not trans else range(len(bounds) - 1, i, -1)
        acc = None
        for j in js:
            oj, bj = bounds[j]
            # L block touching (i, j): forward uses L[oi:, oj:]; transpose
            # uses L[oj:, oi:]^T
            if not trans:
                Lij = lax.dynamic_slice(L, (oi, oj), (bi, bj))
                upd = jnp.dot(
                    Lij,
                    X_blocks[j],
                    preferred_element_type=B.dtype,
                    precision=precision,
                )
            else:
                Lji = lax.dynamic_slice(L, (oj, oi), (bj, bi))
                upd = jnp.dot(
                    Lji.T,
                    X_blocks[j],
                    preferred_element_type=B.dtype,
                    precision=precision,
                )
            acc = upd if acc is None else acc + upd
        if acc is not None:
            rhs = rhs - acc
        Lii = lax.dynamic_slice(L, (oi, oi), (bi, bi))
        inv = _tri_inv(Lii)
        X_blocks[i] = jnp.dot(
            inv.T if trans else inv,
            rhs,
            preferred_element_type=B.dtype,
            precision=precision,
        )

    X = jnp.concatenate(X_blocks, axis=0)
    return X[:, 0] if vec else X
