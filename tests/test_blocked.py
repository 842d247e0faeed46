"""Blocked (panel) Cholesky / TRSM and the fused Pallas panel kernel.

These are the production fast paths above ``MIN_BLOCKED_N`` (wired through
``linalg.safe_cholesky`` / ``gp.posterior``); correctness here is against
NumPy/SciPy f64 oracles (SURVEY.md sec. 4 item 2). The threshold constant is
monkeypatched down so the multi-panel code path runs at CPU-friendly sizes —
the panel loop is shape-generic, so n=608/block=128 exercises exactly the
code that runs at n=8192/block=512 on TPU (where bench.py's parity gate
validates it compiled). The Pallas panel kernel runs in interpret mode on
CPU (kept to one small size — interpret mode is slow).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import solve_triangular

from gaussian_process_tpu.linalg import blocked
from gaussian_process_tpu.linalg.cholesky import safe_cholesky


def _spd(rng, n, jitter=1e-3):
    x = rng.uniform(-5, 5, (n, 4))
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.exp(-0.5 * sq) + jitter * np.eye(n)


@pytest.fixture
def small_threshold(monkeypatch):
    """Lower MIN_BLOCKED_N so CPU-friendly sizes can take the blocked path.

    Dispatch condition is n > max(block, MIN_BLOCKED_N): with this patch the
    blocked path needs n > block (128 in most tests here; DEFAULT_BLOCK for
    callers that don't pass one) — not simply n >= 256."""
    monkeypatch.setattr(blocked, "MIN_BLOCKED_N", 256)


class TestBlockedCholesky:
    def test_matches_stock_multi_panel(self, rng, small_threshold):
        n = 608  # 5 panels at block=128, n % block != 0 (ragged tail panel)
        K = _spd(rng, n)
        L = np.asarray(
            blocked.blocked_cholesky(jnp.asarray(K), block=128, use_pallas=False)
        )
        L0 = np.linalg.cholesky(K)
        np.testing.assert_allclose(L, L0, rtol=1e-8, atol=1e-9)
        assert np.allclose(np.triu(L, 1), 0.0)

    def test_small_n_delegates_to_stock(self, rng):
        K = _spd(rng, 64)
        L = np.asarray(blocked.blocked_cholesky(jnp.asarray(K), use_pallas=False))
        np.testing.assert_allclose(L, np.linalg.cholesky(K), rtol=1e-10)

    def test_nan_on_indefinite(self, rng, small_threshold):
        n = 384
        K = _spd(rng, n)
        K[n - 1, n - 1] = -1e3  # indefinite trailing block
        L = np.asarray(
            blocked.blocked_cholesky(jnp.asarray(K), block=128, use_pallas=False)
        )
        assert np.isnan(np.diag(L)).any()

    @pytest.mark.parametrize("n,block", [(608, 128), (1184, 256), (300, 128)])
    def test_leftlook_matches_stock(self, rng, small_threshold, n, block):
        """Left-looking tiled variant: identical semantics to stock/blocked
        (incl. ragged tail panels and n < block delegation)."""
        K = _spd(rng, n)
        L = np.asarray(blocked.leftlook_cholesky(jnp.asarray(K), block=block))
        np.testing.assert_allclose(L, np.linalg.cholesky(K), rtol=1e-8, atol=1e-9)
        assert np.allclose(np.triu(L, 1), 0.0)

    def test_leftlook_nan_on_indefinite_leading_block(self, rng, small_threshold):
        """A NaN from an indefinite EARLY panel must propagate to the factor
        diagonal (safe_cholesky's check) through the left-looking updates."""
        n = 384
        K = _spd(rng, n)
        K[10, 10] = -1e3  # indefinite inside the first panel
        L = np.asarray(blocked.leftlook_cholesky(jnp.asarray(K), block=128))
        assert np.isnan(np.diag(L)).any()

    def test_safe_cholesky_routes_through_blocked(self, rng, small_threshold,
                                                  monkeypatch):
        """safe_cholesky above the (patched) threshold must dispatch into the
        blocked factorization and produce the same factor. The dispatcher is
        semantics-invisible, so the numeric check alone would also pass on a
        silent fallback to stock — a spy asserts blocked_cholesky really ran
        (ADVICE.md round 2). n > DEFAULT_BLOCK so the default-block call
        takes the multi-panel branch, with a ragged tail panel."""
        n = blocked.DEFAULT_BLOCK + 160
        K = _spd(rng, n)
        called = []
        real = blocked.blocked_cholesky

        def spy(K, **kw):
            called.append(K.shape)
            return real(K, **kw)

        monkeypatch.setattr(blocked, "blocked_cholesky", spy)
        res = safe_cholesky(jnp.asarray(K))
        # >= 1: the happy-path factorization plus the (traced-only) retry body
        assert called and all(s == (n, n) for s in called), (
            "dispatcher did not route through blocked"
        )
        assert bool(res.ok)
        np.testing.assert_allclose(
            np.asarray(res.factor), np.linalg.cholesky(K), rtol=1e-8, atol=1e-9
        )


class TestBlockedTriSolve:
    @pytest.mark.parametrize("trans", [False, True])
    def test_matches_scipy(self, rng, small_threshold, trans):
        n = 608
        K = _spd(rng, n)
        L = np.linalg.cholesky(K)
        B = rng.standard_normal((n, 32))
        X = np.asarray(
            blocked.blocked_tri_solve(
                jnp.asarray(L), jnp.asarray(B), trans=trans, block=128
            )
        )
        X0 = solve_triangular(L.T if trans else L, B, lower=not trans)
        np.testing.assert_allclose(X, X0, rtol=1e-7, atol=1e-8)

    @pytest.mark.parametrize("trans", [False, True])
    def test_shared_panel_inverses(self, rng, small_threshold, trans):
        """blocked_tri_solve(invs=panel_inverses(L)) — the exact reuse
        pattern gp/regression.py's blocked branch relies on (one inversion
        pass shared by the forward and the transposed solve) — must match
        scipy in both directions (ADVICE r3 medium #2)."""
        n = 608
        L = np.linalg.cholesky(_spd(rng, n))
        B = rng.standard_normal((n, 8))
        invs = blocked.panel_inverses(jnp.asarray(L), block=128)
        X = np.asarray(
            blocked.blocked_tri_solve(
                jnp.asarray(L), jnp.asarray(B), trans=trans, block=128,
                invs=invs,
            )
        )
        X0 = solve_triangular(L.T if trans else L, B, lower=not trans)
        np.testing.assert_allclose(X, X0, rtol=1e-7, atol=1e-8)

    def test_vector_rhs(self, rng, small_threshold):
        n = 384
        L = np.linalg.cholesky(_spd(rng, n))
        b = rng.standard_normal(n)
        x = np.asarray(
            blocked.blocked_tri_solve(jnp.asarray(L), jnp.asarray(b), block=128)
        )
        np.testing.assert_allclose(
            x, solve_triangular(L, b, lower=True), rtol=1e-7, atol=1e-8
        )


class TestPallasPanel:
    def test_chol_inv_panel_interpret(self, rng):
        from gaussian_process_tpu.ops.pallas.chol import chol_inv_panel

        b = 128
        X = rng.standard_normal((b, b)).astype(np.float32)
        A = X @ X.T / b + np.eye(b, dtype=np.float32)
        L, W = chol_inv_panel(jnp.asarray(A), interpret=True)
        L0 = np.linalg.cholesky(A.astype(np.float64))
        W0 = np.linalg.inv(L0)
        assert np.max(np.abs(np.asarray(L) - L0)) / np.max(np.abs(L0)) < 1e-5
        assert np.max(np.abs(np.asarray(W) - W0)) / np.max(np.abs(W0)) < 1e-5
        # strictly lower-triangular outputs
        assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
        assert np.allclose(np.triu(np.asarray(W), 1), 0.0)

    def test_padding_path(self, rng):
        """b not a multiple of 128 pads with an identity extension that must
        not leak into the returned factors."""
        from gaussian_process_tpu.ops.pallas.chol import chol_inv_panel

        b = 96
        X = rng.standard_normal((b, b)).astype(np.float32)
        A = X @ X.T / b + np.eye(b, dtype=np.float32)
        L, W = chol_inv_panel(jnp.asarray(A), interpret=True)
        assert L.shape == (b, b) and W.shape == (b, b)
        L0 = np.linalg.cholesky(A.astype(np.float64))
        assert np.max(np.abs(np.asarray(L) - L0)) / np.max(np.abs(L0)) < 1e-5
