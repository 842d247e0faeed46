"""Cholesky factorization and triangular solves with NaN-guarded jitter.

The reference factorizes densely everywhere (``np.linalg.cholesky``
[ref: GP_regression.py:138]) and — wastefully — inverts triangular factors
(``np.linalg.inv(L)`` [ref: GP_binary_classification.py:108,
CO2_example.py:144,169,199]). Here every solve goes through
``jax.lax.linalg.triangular_solve`` (XLA's blocked TRSM, which maps onto the
MXU), and a non-PSD factorization is detected *inside the compiled program*
(NaN on the factor diagonal) and retried with escalating jitter via
``lax.while_loop`` — no host round-trip, jit/vmap/grad-safe.

Jitter escalation generalizes the reference's fixed constants
(s = 5e-4 observation noise, 1e-6 sampling jitter; SURVEY.md Q6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class CholeskyResult(NamedTuple):
    factor: jnp.ndarray  # lower-triangular L with K + jitter*I = L L^T
    jitter: jnp.ndarray  # scalar jitter actually applied (0 if none needed)
    ok: jnp.ndarray  # scalar bool: factorization succeeded


def _chol_ok(L: jnp.ndarray) -> jnp.ndarray:
    # XLA's cholesky writes NaN rows on indefinite input; the diagonal is the
    # cheapest sufficient check (SURVEY.md sec. 5 "race detection" row: NaN on
    # the factor diagonal is the real GP failure mode).
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(d) & (d > 0))


def safe_cholesky(
    K: jnp.ndarray,
    *,
    initial_jitter: float = 0.0,
    min_retry_jitter: float = None,
    jitter_growth: float = 10.0,
    max_attempts: int = 8,
) -> CholeskyResult:
    """Cholesky of K (+ escalating jitter*I on failure), jit- AND grad-safe.

    ``initial_jitter`` is added unconditionally (use it for the reference's
    noise term s*I [ref: GP_regression.py:138]); retries start near machine
    epsilon for K's dtype, scaled by mean diagonal magnitude (float32 on TPU
    needs ~1e4x more jitter than the reference's float64 constants assume).

    Grad note: the jitter *search* runs on ``stop_gradient(K)`` inside a
    ``lax.while_loop`` — reverse-mode AD never differentiates through the
    retry loop (which JAX forbids); the returned factor comes from one final
    differentiable factorization at the selected jitter. Under jit, XLA CSEs
    the duplicate no-retry factorization away.
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    if min_retry_jitter is None:
        min_retry_jitter = 10.0 * float(jnp.finfo(K.dtype).eps)

    K0 = K + jnp.asarray(initial_jitter, K.dtype) * eye
    Kng = lax.stop_gradient(K0)
    scale = jnp.mean(jnp.abs(jnp.diagonal(Kng, axis1=-2, axis2=-1))) + jnp.asarray(
        1.0, K.dtype
    )

    def cond(state):
        attempt, L, _ = state
        return (~_chol_ok(L)) & (attempt < max_attempts)

    def body(state):
        attempt, _, _ = state
        jit_val = (
            jnp.asarray(min_retry_jitter, K.dtype)
            * scale
            * (jitter_growth ** attempt.astype(K.dtype))
        )
        L = lax.linalg.cholesky(Kng + jit_val * eye)
        return attempt + 1, L, jit_val

    zero = jnp.asarray(0.0, K.dtype)
    L0 = lax.linalg.cholesky(Kng)
    _, L_ng, jitter = lax.while_loop(cond, body, (jnp.asarray(0), L0, zero))

    # Final differentiable factorization at the (gradient-stopped) jitter.
    L = lax.linalg.cholesky(K0 + jitter * eye)
    return CholeskyResult(
        factor=L,
        jitter=jitter + jnp.asarray(initial_jitter, K.dtype),
        ok=_chol_ok(L_ng),
    )


def tri_solve(L: jnp.ndarray, b: jnp.ndarray, *, lower: bool = True, trans: bool = False) -> jnp.ndarray:
    """Solve L x = b (or L^T x = b with ``trans``) for lower-triangular L.

    Replaces the reference's ``np.linalg.solve(L, ...)`` pairs
    [ref: GP_regression.py:139-140] and its explicit ``np.linalg.inv(L)``
    [ref: GP_binary_classification.py:108] with blocked TRSM.
    """
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    x = lax.linalg.triangular_solve(
        L,
        b,
        left_side=True,
        lower=lower,
        transpose_a=trans,
    )
    return x[..., 0] if vec else x


def cholesky_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b — the alpha = L^T \\ (L \\ y) pattern of
    R&W Alg. 2.1 [ref: GP_regression.py:139-140]."""
    return tri_solve(L, tri_solve(L, b), trans=True)


def logdet_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    """log |K| = 2 * sum(log diag L) — the corrected LML logdet term
    [ref: tune_hyperparms_regression.py:141; the inline variant at
    GP_regression.py:151 omits the log (reference quirk Q1)]."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def add_diagonal(K: jnp.ndarray, value) -> jnp.ndarray:
    """K + value * I without materialising an identity matrix."""
    n = K.shape[-1]
    idx = jnp.arange(n)
    return K.at[..., idx, idx].add(value)
