"""Fused panel Cholesky + triangular inverse as one Pallas TPU kernel.

Why this exists: XLA's chol at panel sizes is a long chain of tiny
sequential ops (measured v5e: chol(128) 63 us, chol(512) 264 us, slope-timed
inside a fori chain), so a wide-panel blocked factorization
(linalg/blocked.py) spends a large share of its time in the small diagonal
factorizations rather than the MXU trailing updates where the n^3/3 FLOPs
are.

Measured outcome (v5e, honest slope timing): this kernel lands at ~253 us
for b=256 — Mosaic's per-``fori_loop``-iteration overhead (~0.6 us x b pivot
steps) eats what fusing the factor+inverse saves, and the full blocked
factorization is *slower* with it (12.0 ms vs 10.4 ms XLA-panel at n=8192).
It therefore ships OFF by default (``blocked_cholesky(use_pallas=...)``),
kept correct and tested for hardware where the tradeoff flips and as the
panel-factor building block for a future single-kernel potrf.

This kernel factors one (b, b) diagonal panel **and** produces its inverse
in a single Pallas program that never leaves VMEM:

    A_kk = L L^T,   W = L^{-1}

so the caller's panel solve becomes a GEMM (``A_ik @ W^T``) and no XLA
triangular op appears anywhere in the blocked factorization. Two levels:

- inner: unblocked 128-step Cholesky on a (128, 128) sub-tile held in
  registers/VMEM, one ``fori_loop`` step per pivot. Rows are extracted with
  mask-reductions (no dynamic lane slicing), the trailing update is one
  VPU outer product, and the inverse rides along via the forward-substitution
  recurrence  W[j,:] = (e_j - sum_{k<j} L[j,k] W[k,:]) / L[j,j],
  accumulated as ACC += L[:,j] (x) W[j,:] — two more outer products.
- outer: the (b/128)^2 sub-block updates (panel solve vs the inverse,
  trailing SYRK, block forward substitution for the off-diagonal inverse
  blocks) are MXU ``dot``s inside the same kernel, unrolled statically.

Indefinite input behaves exactly like XLA's cholesky: ``rsqrt`` of a
non-positive pivot produces NaN/Inf which propagates to the factor diagonal,
so linalg.cholesky's NaN-diag jitter-retry logic keeps working.

No reference equivalent — the reference factorizes on the host
[ref: GP_regression.py:138]. This is part of the framework's native tier
(SURVEY.md sec. 2: Pallas kernels discharge the native-code obligation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 128  # inner unblocked tile; one MXU/VPU register tile
_MAX_PANEL = 1024  # 3 x (b, b) f32 buffers must fit VMEM comfortably


def _auto_interpret(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def _chol_inv_unblocked(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(m, m) value -> (L, W = L^{-1}); m == SUB, runs on the VPU.

    Row-oriented right-looking elimination: step j extracts row j of the
    partially-updated A (that row equals column j of L scaled by L[j,j]),
    normalises it into U[j,:] = L[:,j]^T, subtracts the rank-1 trailing
    update, and extends the inverse by forward substitution. All row
    reads/writes are mask-reductions/selects — no dynamic slicing.
    """
    m = A.shape[0]
    dt = A.dtype
    rids = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cids = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    col1 = lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def body(j, carry):
        A, U, ACC, W = carry
        rowmask = rids == j
        rowA = jnp.sum(jnp.where(rowmask, A, 0.0), axis=0, keepdims=True)
        diag = jnp.sum(jnp.where(col1 == j, rowA, 0.0))
        d = lax.rsqrt(diag)
        u_row = jnp.where(col1 >= j, rowA * d, 0.0)  # (1, m) = L[:, j]^T
        U = jnp.where(rowmask, u_row, U)
        A = A - u_row.T * u_row  # trailing rank-1 (rows <= j become garbage,
        # never read again)
        accj = jnp.sum(jnp.where(rowmask, ACC, 0.0), axis=0, keepdims=True)
        w_row = (jnp.where(col1 == j, 1.0, 0.0) - accj) * d
        W = jnp.where(rowmask, w_row, W)
        ACC = ACC + u_row.T * w_row
        return A, U, ACC, W

    zero = jnp.zeros((m, m), dt)
    _, U, _, W = lax.fori_loop(0, m, body, (A, zero, zero, zero))
    return U.T, W


def _dot(a, b):
    # in-kernel MXU matmul; f32 inputs at 3-pass bf16 precision (f32-accurate
    # for the O(1)-magnitude kernel-matrix panels; see linalg/blocked.py)
    return lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _panel_kernel(nsub: int):
    """Kernel body factory for a (nsub*SUB, nsub*SUB) panel."""

    def kern(a_ref, l_ref, w_ref, A_scr):
        A_scr[:] = a_ref[:]
        l_ref[:] = jnp.zeros_like(l_ref)
        w_ref[:] = jnp.zeros_like(w_ref)

        # factorization sweep (right-looking over SUB-wide sub-panels)
        for s in range(nsub):
            o = s * SUB
            Ls, Ws = _chol_inv_unblocked(A_scr[o : o + SUB, o : o + SUB])
            l_ref[o : o + SUB, o : o + SUB] = Ls
            w_ref[o : o + SUB, o : o + SUB] = Ws
            if s + 1 < nsub:
                A21 = A_scr[o + SUB :, o : o + SUB]
                L21 = _dot(A21, Ws.T)
                l_ref[o + SUB :, o : o + SUB] = L21
                A_scr[o + SUB :, o + SUB :] = A_scr[o + SUB :, o + SUB :] - _dot(
                    L21, L21.T
                )

        # inverse assembly: block forward substitution
        #   W[t, s] = -W_tt @ sum_{s <= k < t} L[t, k] @ W[k, s]
        for t in range(nsub):
            ot = t * SUB
            Wtt = w_ref[ot : ot + SUB, ot : ot + SUB]
            for s in range(t):
                os_ = s * SUB
                acc = None
                for k in range(s, t):
                    ok = k * SUB
                    term = _dot(
                        l_ref[ot : ot + SUB, ok : ok + SUB],
                        w_ref[ok : ok + SUB, os_ : os_ + SUB],
                    )
                    acc = term if acc is None else acc + term
                w_ref[ot : ot + SUB, os_ : os_ + SUB] = -_dot(Wtt, acc)

    return kern


def chol_inv_panel(
    A: jnp.ndarray, *, interpret: Optional[bool] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Factor a small SPD panel entirely on-chip: A = L L^T, W = L^{-1}.

    A: (b, b) float32, b <= 1024 (b is padded up to a multiple of 128 with
    an identity extension, invisible in the returned factors). Returns
    (L, W), both lower-triangular. NaN-propagating on indefinite input,
    like ``lax.linalg.cholesky``.
    """
    b = A.shape[-1]
    if A.ndim != 2 or A.shape[0] != b:
        raise ValueError("chol_inv_panel expects one square (b, b) panel")
    bp = -(-b // SUB) * SUB
    if bp > _MAX_PANEL:
        raise ValueError(f"panel {b} exceeds max {_MAX_PANEL}")
    dt = jnp.float32
    Ap = A.astype(dt)
    if bp != b:
        pad = bp - b
        Ap = jnp.pad(Ap, ((0, pad), (0, pad)))
        idx = jnp.arange(bp)
        ext = (idx >= b) & (idx[:, None] == idx[None, :])
        Ap = jnp.where(ext, 1.0, Ap)

    nsub = bp // SUB
    L, W = pl.pallas_call(
        _panel_kernel(nsub),
        out_shape=(
            jax.ShapeDtypeStruct((bp, bp), dt),
            jax.ShapeDtypeStruct((bp, bp), dt),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((bp, bp), dt)],
        interpret=_auto_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp**3,
            bytes_accessed=3 * bp * bp * 4,
            transcendentals=bp,
        ),
    )(Ap)
    if bp != b:
        L = L[:b, :b]
        W = W[:b, :b]
    return L, W
