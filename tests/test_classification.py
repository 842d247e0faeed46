"""Laplace-GPC parity tests: binary vs float64 true-Newton oracle, multi-class
vs a dense full-system Newton oracle, accuracies on the reference's datasets
(moons / blobs) [BASELINE.json configs 4-5].
"""

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.datasets import make_moons, make_blobs
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import StandardScaler

from gaussian_process_tpu import gp, ops
import oracles


def _moons():
    """[ref: GP_binary_classification.py:13-32,160-161] — moons, labels in
    {-1,+1}, standardised, 60/40 split, random_state=42."""
    X, y = make_moons(noise=0.3, random_state=0)
    y = np.where(y == 0, -1, 1)
    X = StandardScaler().fit_transform(X)
    return train_test_split(X, y, test_size=0.4, random_state=42)


def _blobs():
    """[ref: GP_multi_classification.py:200-211,215-220] — 3 blobs, 60/40."""
    X, y = make_blobs(n_features=2, centers=3, random_state=7)
    return train_test_split(X, y, test_size=0.4, random_state=42)


class TestBinaryLaplace:
    def test_mode_matches_oracle(self, rng):
        X_train, _, y_train, _ = _moons()
        K = oracles.rbf(X_train, X_train, 1.0, 1.0)
        f_oracle, a, L, sW, grad = oracles.laplace_binary_mode(K, y_train.astype(float))

        state = gp.laplace_fit(jnp.asarray(K), jnp.asarray(y_train, dtype=jnp.float64))
        assert bool(state.converged)
        np.testing.assert_allclose(state.f_mode, f_oracle, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(state.sqrt_w, sW, rtol=1e-6, atol=1e-8)

    def test_mode_self_consistency(self):
        """At the mode, f = K (t - pi(f)) — the stationarity condition."""
        X_train, _, y_train, _ = _moons()
        k = ops.RBF()
        p = k.init_params()
        state = gp.fit_binary(k, p, X_train, jnp.asarray(y_train, dtype=jnp.float64))
        K = np.asarray(ops.gram(k, p, X_train))
        np.testing.assert_allclose(
            state.f_mode, K @ np.asarray(state.grad_at_mode), rtol=1e-5, atol=1e-6
        )

    def test_prediction_matches_oracle(self):
        X_train, X_test, y_train, _ = _moons()
        K = oracles.rbf(X_train, X_train, 1.0, 1.0)
        K_s = oracles.rbf(X_train, X_test, 1.0, 1.0)
        kss = np.ones(len(X_test))
        f, a, L, sW, grad = oracles.laplace_binary_mode(K, y_train.astype(float))
        mean_o, var_o = oracles.laplace_binary_predict(K_s, kss, grad, L, sW)

        k = ops.RBF()
        p = k.init_params()
        state = gp.fit_binary(k, p, X_train, jnp.asarray(y_train, dtype=jnp.float64))
        pred = gp.predict_binary(k, p, state, X_train, X_test)
        np.testing.assert_allclose(pred.mean, mean_o, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(pred.var, np.maximum(var_o, 0), rtol=1e-5, atol=1e-7)

    def test_accuracy_on_moons(self):
        """The reference's reported metric [ref: GP_binary_classification.py:241].
        With true Newton the accuracy must be at least solid on moons."""
        X_train, X_test, y_train, y_test = _moons()
        k = ops.RBF()
        p = k.init_params()
        state = gp.fit_binary(k, p, X_train, jnp.asarray(y_train, dtype=jnp.float64))
        pred = gp.predict_binary(k, p, state, X_train, X_test)
        acc = float(np.mean(np.asarray(pred.label) == y_test))
        assert acc >= 0.85, acc

    def test_newton_converges_fast(self):
        """True Newton takes O(10) iterations, not the reference's thousands."""
        X_train, _, y_train, _ = _moons()
        k = ops.RBF()
        state = gp.fit_binary(
            k, k.init_params(), X_train, jnp.asarray(y_train, dtype=jnp.float64)
        )
        assert int(state.iters) < 30


def _multiclass_full_newton_oracle(K_block, Y, max_iters=100, tol=1e-10):
    """Dense (Cn x Cn) Newton on the stacked system — slow but direct:
    f_new = K a with a from the standard Laplace update using explicit
    W = D - PI PI^T. Ground truth for the blocked/vmapped implementation."""
    C, n = Y.shape
    Kfull = np.zeros((C * n, C * n))
    for c in range(C):
        Kfull[c * n : (c + 1) * n, c * n : (c + 1) * n] = K_block
    f = np.zeros(C * n)
    y = Y.reshape(-1)
    for _ in range(max_iters):
        F = f.reshape(C, n)
        P = np.exp(F - F.max(0)) / np.exp(F - F.max(0)).sum(0)
        pi = P.reshape(-1)
        Pi = np.zeros((C * n, n))
        for c in range(C):
            Pi[c * n : (c + 1) * n, :] = np.diag(P[c])
        W = np.diag(pi) - Pi @ Pi.T
        b = W @ f + y - pi
        A = np.eye(C * n) + W @ Kfull
        a = np.linalg.solve(A, b)
        f_new = Kfull @ a
        if np.linalg.norm(f_new - f) < tol:
            f = f_new
            break
        f = f_new
    F = f.reshape(C, n)
    P = np.exp(F - F.max(0)) / np.exp(F - F.max(0)).sum(0)
    return F, P


class TestMulticlassLaplace:
    def test_mode_matches_full_system_oracle(self):
        X_train, _, y_train, _ = _blobs()
        X_train, y_train = X_train[:30], y_train[:30]  # keep the dense oracle fast
        C = 3
        K = oracles.rbf(X_train, X_train, 1.0, 1.0)
        Y = np.eye(C)[:, y_train]
        F_o, P_o = _multiclass_full_newton_oracle(K, Y)

        k = ops.RBF()
        state = gp.fit_multiclass(
            k, k.init_params(), X_train, jnp.asarray(y_train), C, tol=1e-10
        )
        assert bool(state.converged)
        np.testing.assert_allclose(state.f_mode, F_o, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(state.pi, P_o, rtol=1e-5, atol=1e-7)

    def test_mode_self_consistency(self):
        X_train, _, y_train, _ = _blobs()
        C = 3
        k = ops.RBF()
        p = k.init_params()
        state = gp.fit_multiclass(k, p, X_train, jnp.asarray(y_train), C, tol=1e-10)
        K = np.asarray(ops.gram(k, p, X_train))
        Y = np.eye(C)[:, y_train]
        # stationarity: f_c = K (y_c - pi_c)
        np.testing.assert_allclose(
            state.f_mode, (Y - np.asarray(state.pi)) @ K.T, rtol=1e-4, atol=1e-5
        )

    def test_accuracy_on_blobs(self):
        """The reference's reported metric [ref: GP_multi_classification.py:253]."""
        X_train, X_test, y_train, y_test = _blobs()
        C = 3
        k = ops.RBF()
        p = k.init_params()
        state = gp.fit_multiclass(k, p, X_train, jnp.asarray(y_train), C)
        pred = gp.predict_multiclass(
            k, p, state, X_train, jnp.asarray(y_train), X_test, C
        )
        acc = float(np.mean(np.asarray(pred.label) == y_test))
        assert acc >= 0.9, acc

    def test_arbitrary_n_not_stride60(self):
        """Quirk Q3 regression guard: works for n != 60."""
        X, y = make_blobs(n_features=2, centers=3, n_samples=47, random_state=3)
        k = ops.RBF()
        state = gp.fit_multiclass(k, k.init_params(), X, jnp.asarray(y), 3)
        assert state.f_mode.shape == (3, 47)
        assert bool(jnp.isfinite(state.f_mode).all())

    def test_probs_sum_to_one(self):
        X_train, X_test, y_train, _ = _blobs()
        k = ops.RBF()
        p = k.init_params()
        state = gp.fit_multiclass(k, p, X_train, jnp.asarray(y_train), 3)
        pred = gp.predict_multiclass(
            k, p, state, X_train, jnp.asarray(y_train), X_test, 3
        )
        np.testing.assert_allclose(np.asarray(pred.prob).sum(0), 1.0, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(state.pi).sum(0), 1.0, rtol=1e-8)


class TestReferenceModeBinary:
    """laplace_fit(mode='reference') reproduces the reference's frozen-W
    solve and its printed accuracy metric (SURVEY.md quirk Q2; VERDICT
    'reference-metric reproduction modes')."""

    def test_matches_frozen_w_oracle(self, rng):
        X_train, _, y_train, _ = _moons()
        K = oracles.rbf(X_train, X_train, 1.0, 1.0)
        f_prior = rng.standard_normal(len(y_train))  # stand-in prior sample
        f_o, grad_o, L_o, sW_o = oracles.laplace_binary_reference_mode(
            K, y_train.astype(float), f_prior
        )
        state = gp.laplace_fit(
            jnp.asarray(K),
            jnp.asarray(y_train, jnp.float64),
            f_init=jnp.asarray(f_prior),
            mode="reference",
            max_iters=10000,
        )
        assert bool(state.converged)
        np.testing.assert_allclose(state.f_mode, f_o, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(state.grad_at_mode, grad_o, rtol=1e-10)
        np.testing.assert_allclose(state.sqrt_w, sW_o, rtol=1e-10)
        np.testing.assert_allclose(state.chol_B, L_o, rtol=1e-8, atol=1e-10)

    def test_reference_mode_moons_accuracy(self):
        """End-to-end quirk-Q2 pipeline: prior sample drawn with
        lengthscale = num_train (the reference's argument-slot accident,
        [ref: GP_binary_classification.py:193 vs GP_regression.py:71]) on a
        linspace sampling grid [ref: :203-208], frozen-W fit, batched
        prediction -> the reference's printed 'classification right rate'
        [ref: :241]. RNG-dependent, so assert the distributional band the
        reference's own runs land in rather than one value."""
        X_train, X_test, y_train, y_test = _moons()
        n = len(X_train)
        X = np.vstack([X_train, X_test])
        grid = np.stack(
            [
                np.linspace(X[:, 0].min(), X[:, 0].max(), n),
                np.linspace(X[:, 1].min(), X[:, 1].max(), n),
            ],
            axis=1,
        )
        k = ops.RBF()
        # lengthscale = num_train = 60: quirk Q2's accidental kernel params
        p_prior = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(float(n))}
        f_prior = gp.sample_prior(
            k, p_prior, grid, jax.random.key(3), num_functions=1
        )[:, 0]
        p = k.init_params()
        state = gp.fit_binary(
            k, p, X_train, jnp.asarray(y_train, jnp.float64),
            f_init=f_prior, mode="reference", max_iters=10000,
        )
        pred = gp.predict_binary(k, p, state, X_train, X_test)
        acc = float(np.mean(np.asarray(pred.label) == y_test))
        assert acc >= 0.5  # frozen-W at a random prior is weak but above chance

        # the corrected algorithm on the same data must do at least as well
        state_n = gp.fit_binary(k, p, X_train, jnp.asarray(y_train, jnp.float64))
        pred_n = gp.predict_binary(k, p, state_n, X_train, X_test)
        acc_n = float(np.mean(np.asarray(pred_n.label) == y_test))
        assert acc_n >= acc - 1e-9
        assert acc_n >= 0.85


class TestReferenceModeMulticlass:
    """laplace_fit_multiclass(mode='reference') reproduces trainer2 (quirk
    Q4: '+ y + pi' and the half-solve update) and the reference's printed
    blobs accuracy [ref: GP_multi_classification.py:129-176,253]."""

    def test_matches_trainer2_oracle(self):
        from scipy.linalg import block_diag

        X_train, _, y_train, _ = _blobs()
        X_train = X_train[:21]  # small n keeps the oracle loop fast
        y_train = y_train[:21]
        C, n = 3, len(y_train)
        Kc = oracles.rbf(X_train, X_train, 1.0, 1.0)
        K_full = block_diag(Kc, Kc, Kc)
        y1h = np.zeros((C, n))
        y1h[y_train, np.arange(n)] = 1.0
        f_o, piv_o = oracles.multiclass_reference_mode(
            K_full, y1h.reshape(C * n), C, n, max_iters=3000
        )
        K = jnp.broadcast_to(jnp.asarray(Kc), (C, n, n))
        state = gp.laplace_fit_multiclass(
            K, jnp.asarray(y1h), mode="reference", max_iters=3000
        )
        np.testing.assert_allclose(
            np.asarray(state.f_mode).reshape(C * n), f_o, rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(state.pi).reshape(C * n), piv_o, rtol=1e-6, atol=1e-8
        )

    def test_reference_mode_blobs_accuracy(self):
        """End-to-end: reference-mode fit + the reference's y - pi predictor
        -> its printed accuracy; the corrected Newton must do at least as
        well on the same data."""
        X_train, X_test, y_train, y_test = _blobs()
        k = ops.RBF()
        p = k.init_params()
        st_ref = gp.fit_multiclass(
            k, p, X_train, jnp.asarray(y_train), 3, mode="reference",
            max_iters=3000,
        )
        pred_ref = gp.predict_multiclass(
            k, p, st_ref, X_train, jnp.asarray(y_train), X_test, 3
        )
        acc_ref = float(np.mean(np.asarray(pred_ref.label) == y_test))
        st = gp.fit_multiclass(k, p, X_train, jnp.asarray(y_train), 3)
        pred = gp.predict_multiclass(
            k, p, st, X_train, jnp.asarray(y_train), X_test, 3
        )
        acc = float(np.mean(np.asarray(pred.label) == y_test))
        assert acc_ref >= 0.8  # the reference's printed metric range
        assert acc >= acc_ref - 1e-9


class TestJitDefaultTol:
    def test_fit_binary_jits_with_default_tol(self, rng):
        """r4 regression: the default-tol expression used jnp.sqrt, which
        omnistaging stages into the trace even on a concrete scalar —
        float() of the tracer raised ConcretizationTypeError, so
        fit_binary could never run under an outer jit without an explicit
        tol (found by the laplace bench mode)."""
        n = 48
        x = jnp.asarray(rng.uniform(-3, 3, (n, 2)), jnp.float32)
        y = jnp.asarray(np.where(rng.standard_normal(n) > 0, 1.0, -1.0),
                        jnp.float32)
        k = ops.RBF()

        @jax.jit
        def f(c):
            p = {"sigma": jnp.float32(1.0) + c * 0.0,
                 "lengthscale": jnp.float32(1.0)}
            return gp.fit_binary(k, p, x, y).lml

        assert np.isfinite(float(f(jnp.float32(0.0))))

    def test_fit_multiclass_jits_with_default_tol(self, rng):
        n = 48
        x = jnp.asarray(rng.uniform(-3, 3, (n, 2)), jnp.float32)
        y = jnp.asarray(np.arange(n) % 3, jnp.int32)
        k = ops.RBF()

        @jax.jit
        def f(c):
            p = {"sigma": jnp.float32(1.0) + c * 0.0,
                 "lengthscale": jnp.float32(1.0)}
            st = gp.fit_multiclass(k, p, x, y, num_classes=3)
            return st.f_mode.sum()

        assert np.isfinite(float(f(jnp.float32(0.0))))


class TestMatrixFreeLaplace:
    """laplace_fit_cg / predict_binary_cg: the large-n binary path (r5,
    VERDICT r4 weak #6 — every Newton step previously factorized n x n).
    Parity against the dense true-Newton path on CPU; the CG inner solves
    and the Nyström-Woodbury preconditioner must reproduce probabilities,
    variances and labels to solver tolerance."""

    def _problem(self, rng, n=500, m=80):
        x = jnp.asarray(rng.uniform(-3, 3, (n, 2)))
        f_true = np.sin(np.asarray(x).sum(axis=1))
        y = jnp.asarray(
            np.where(f_true + 0.3 * rng.standard_normal(n) > 0, 1.0, -1.0)
        )
        xt = jnp.asarray(rng.uniform(-3, 3, (m, 2)))
        k = ops.RBF()
        return k, k.init_params(), x, y, xt

    def test_fit_predict_matches_dense(self, rng):
        k, p, x, y, xt = self._problem(rng)
        dense = gp.fit_binary(k, p, x, y)
        dpred = gp.predict_binary(k, p, dense, x, xt)
        cgst = gp.laplace_fit_cg(k, p, x, y, precond_rank=64,
                                 use_pallas=False)
        cpred = gp.predict_binary_cg(k, p, cgst, x, xt, use_pallas=False)
        assert int(cgst.iters) == int(dense.iters)
        assert bool(cgst.converged)
        np.testing.assert_allclose(np.asarray(cgst.f_mode),
                                   np.asarray(dense.f_mode),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cpred.prob),
                                   np.asarray(dpred.prob),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cpred.var),
                                   np.asarray(dpred.var),
                                   rtol=1e-4, atol=1e-7)
        assert np.array_equal(np.asarray(cpred.label),
                              np.asarray(dpred.label))

    def test_slq_lml_close_to_dense(self, rng):
        k, p, x, y, _ = self._problem(rng, n=400)
        dense = gp.fit_binary(k, p, x, y)
        cgst = gp.laplace_fit_cg(k, p, x, y, precond_rank=64,
                                 use_pallas=False, compute_lml=True,
                                 lml_probes=16, lml_lanczos_iters=32)
        rel = abs(float(cgst.lml) - float(dense.lml)) / abs(float(dense.lml))
        # SLQ is a stochastic estimator: 16 Rademacher probes put the
        # logdet term's standard error at the ~1% level (measured 0.8%
        # on this problem) — the gate bounds estimator sanity, not
        # determinism
        assert rel < 2e-2, (float(cgst.lml), float(dense.lml))

    def test_warm_start_resumes(self, rng):
        """f_init warm start (checkpoint/resume of the Newton run): a fit
        restarted from the converged mode finishes in <= 2 iterations."""
        k, p, x, y, _ = self._problem(rng, n=300)
        st1 = gp.laplace_fit_cg(k, p, x, y, precond_rank=48,
                                use_pallas=False)
        st2 = gp.laplace_fit_cg(k, p, x, y, precond_rank=48,
                                use_pallas=False, f_init=st1.f_mode)
        assert int(st2.iters) <= 2
        np.testing.assert_allclose(np.asarray(st2.f_mode),
                                   np.asarray(st1.f_mode),
                                   rtol=1e-6, atol=1e-8)

    def test_moons_accuracy_matches_dense(self, rng):
        """End-to-end on the reference's moons workload
        [ref: GP_binary_classification.py:157-250]: identical test-set
        accuracy from the dense and matrix-free pipelines."""
        X, yb = make_moons(n_samples=240, noise=0.25, random_state=0)
        X = StandardScaler().fit_transform(X)
        y01 = np.where(yb > 0, 1.0, -1.0)
        xtr, xte, ytr, yte = train_test_split(
            X, y01, test_size=0.4, random_state=0
        )
        k = ops.RBF()
        p = k.init_params()
        dense = gp.fit_binary(k, p, jnp.asarray(xtr), jnp.asarray(ytr))
        dpred = gp.predict_binary(k, p, dense, jnp.asarray(xtr),
                                  jnp.asarray(xte))
        cgst = gp.laplace_fit_cg(k, p, jnp.asarray(xtr), jnp.asarray(ytr),
                                 precond_rank=48, use_pallas=False)
        cpred = gp.predict_binary_cg(k, p, cgst, jnp.asarray(xtr),
                                     jnp.asarray(xte), use_pallas=False)
        acc_d = float(np.mean(np.asarray(dpred.label) == yte))
        acc_c = float(np.mean(np.asarray(cpred.label) == yte))
        assert acc_c == acc_d and acc_c > 0.85


class TestMatrixFreeMulticlass:
    """laplace_fit_multiclass_cg / predict_multiclass_cg (r5): multiclass
    joins the matrix-free tier. Each Newton step solves the STACKED
    B = I + W^{1/2} K W^{1/2} system by preconditioned CG with per-point
    (C, C) W-roots; one fused kernel sweep serves all C classes."""

    def _problem(self, rng, n=300, m=60, C=3):
        x = jnp.asarray(rng.uniform(-3, 3, (n, 2)))
        ang = np.arctan2(np.asarray(x)[:, 1], np.asarray(x)[:, 0])
        yl = jnp.asarray(((ang + np.pi) / (2 * np.pi) * C).astype(int) % C)
        xt = jnp.asarray(rng.uniform(-3, 3, (m, 2)))
        k = ops.RBF()
        return k, k.init_params(), x, yl, xt, C

    def test_fit_predict_matches_dense(self, rng):
        k, p, x, yl, xt, C = self._problem(rng)
        dense = gp.fit_multiclass(k, p, x, yl, num_classes=C)
        dpred = gp.predict_multiclass(k, p, dense, x, yl, xt, num_classes=C)
        cgst = gp.laplace_fit_multiclass_cg(
            k, p, x, yl, C, precond_rank=64, use_pallas=False
        )
        cpred = gp.predict_multiclass_cg(k, p, cgst, x, yl, xt, C)
        assert int(cgst.iters) == int(dense.iters)
        assert bool(cgst.converged)
        np.testing.assert_allclose(np.asarray(cgst.f_mode),
                                   np.asarray(dense.f_mode),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cpred.prob),
                                   np.asarray(dpred.prob),
                                   rtol=1e-4, atol=1e-5)
        assert np.array_equal(np.asarray(cpred.label),
                              np.asarray(dpred.label))

    def test_dense_lml_matches_stacked_f64_oracle(self, rng):
        """The corrected R&W 3.44 logdet (r5 bug fix — the per-class
        sum_c log|B_c| alone overstates the penalty; log|sum_c E_c|
        carries the other half): dense LML must equal the brute-force
        stacked-system f64 value."""
        k, p, x, yl, _, C = self._problem(rng, n=120, m=8)
        dense = gp.fit_multiclass(k, p, x, yl, num_classes=C)
        K = np.asarray(ops.gram(k, p, x), np.float64)
        pi = np.asarray(dense.pi, np.float64)
        f = np.asarray(dense.f_mode, np.float64)
        n = K.shape[0]
        y1 = np.asarray(gp.one_hot_targets(yl, C), np.float64)
        N = C * n
        W = np.zeros((N, N))
        Kf = np.zeros((N, N))
        for i in range(n):
            pv = pi[:, i]
            Wi = np.diag(pv) - np.outer(pv, pv)
            for c in range(C):
                for d in range(C):
                    W[c * n + i, d * n + i] = Wi[c, d]
        for c in range(C):
            Kf[c * n:(c + 1) * n, c * n:(c + 1) * n] = K
        fv = f.reshape(N)
        a = np.linalg.solve(Kf, fv)
        want = (
            -0.5 * fv @ a + y1.reshape(N) @ fv
            - np.sum(np.log(np.sum(np.exp(f), axis=0)))
            - 0.5 * np.linalg.slogdet(np.eye(N) + W @ Kf)[1]
        )
        np.testing.assert_allclose(float(dense.lml), want, rtol=1e-8)

    def test_slq_lml_close_to_dense(self, rng):
        k, p, x, yl, _, C = self._problem(rng, n=240, m=8)
        dense = gp.fit_multiclass(k, p, x, yl, num_classes=C)
        cgst = gp.laplace_fit_multiclass_cg(
            k, p, x, yl, C, precond_rank=64, use_pallas=False,
            compute_lml=True, lml_probes=16,
        )
        rel = abs(float(cgst.lml) - float(dense.lml)) / abs(float(dense.lml))
        assert rel < 2e-2, (float(cgst.lml), float(dense.lml))

    def test_blobs_accuracy_matches_dense(self, rng):
        """End-to-end on the reference's blobs workload
        [ref: GP_multi_classification.py:200-211]."""
        X, yb = make_blobs(n_samples=180, centers=3, cluster_std=1.2,
                           random_state=0)
        X = StandardScaler().fit_transform(X)
        xtr, xte, ytr, yte = train_test_split(X, yb, test_size=0.4,
                                              random_state=0)
        k = ops.RBF()
        p = k.init_params()
        dense = gp.fit_multiclass(k, p, jnp.asarray(xtr),
                                  jnp.asarray(ytr), num_classes=3)
        dpred = gp.predict_multiclass(k, p, dense, jnp.asarray(xtr),
                                      jnp.asarray(ytr), jnp.asarray(xte),
                                      num_classes=3)
        cgst = gp.laplace_fit_multiclass_cg(
            k, p, jnp.asarray(xtr), jnp.asarray(ytr), 3,
            precond_rank=48, use_pallas=False,
        )
        cpred = gp.predict_multiclass_cg(k, p, cgst, jnp.asarray(xtr),
                                         jnp.asarray(ytr),
                                         jnp.asarray(xte), 3)
        acc_d = float(np.mean(np.asarray(dpred.label) == yte))
        acc_c = float(np.mean(np.asarray(cpred.label) == yte))
        assert acc_c == acc_d and acc_c > 0.85


class TestSegmentedLaplaceCG:
    """laplace_fit_cg_segmented (r5): bounded-call Newton with warm-start
    resume must land on the monolithic matrix-free fit."""

    def test_matches_monolithic(self, rng):
        x = jnp.asarray(rng.uniform(-3, 3, (300, 2)))
        f_true = np.sin(np.asarray(x).sum(axis=1))
        y = jnp.asarray(np.where(
            f_true + 0.3 * rng.standard_normal(300) > 0, 1.0, -1.0))
        k = ops.RBF()
        p = k.init_params()
        mono = gp.laplace_fit_cg(k, p, x, y, precond_rank=48,
                                 use_pallas=False)
        steps = []
        seg = gp.laplace_fit_cg_segmented(
            k, p, x, y, precond_rank=48, use_pallas=False,
            newton_per_call=2,
            checkpoint_cb=lambda i, f: steps.append(i),
        )
        assert len(steps) >= 2 and steps == sorted(steps)
        assert bool(seg.converged)
        np.testing.assert_allclose(np.asarray(seg.f_mode),
                                   np.asarray(mono.f_mode),
                                   rtol=1e-5, atol=1e-7)

    def test_resume_f_continues(self, rng):
        x = jnp.asarray(rng.uniform(-3, 3, (240, 2)))
        y = jnp.asarray(np.where(
            np.sin(np.asarray(x).sum(axis=1)) > 0, 1.0, -1.0))
        k = ops.RBF()
        p = k.init_params()
        ref = gp.laplace_fit_cg_segmented(k, p, x, y, precond_rank=48,
                                          use_pallas=False)
        fs = []
        # "preempt" after the first call by capping max_iters
        part = gp.laplace_fit_cg_segmented(
            k, p, x, y, precond_rank=48, use_pallas=False, max_iters=2,
            newton_per_call=2, checkpoint_cb=lambda i, f: fs.append(f),
        )
        resumed = gp.laplace_fit_cg_segmented(
            k, p, x, y, precond_rank=48, use_pallas=False,
            resume_f=fs[-1],
        )
        np.testing.assert_allclose(np.asarray(resumed.f_mode),
                                   np.asarray(ref.f_mode),
                                   rtol=1e-6, atol=1e-8)
