"""Hyperparameter-optimisation tests: jax.grad vs the reference's analytic
gradient, full ascent loop, and all four BO acquisitions (fixing quirk Q5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_tpu import gp, ops, opt
import oracles

NOISE = 5e-4


def _data(rng, n=6):
    x = rng.uniform(-5, 5, size=(n, 1))
    y = np.sin(0.9 * x).ravel() + np.sqrt(NOISE) * rng.standard_normal(n)
    return x, y


class TestGradCorrectness:
    def test_jax_grad_matches_analytic_rbf_lengthscale(self, rng):
        """jax.grad through the LML must equal the reference's hand-derived
        dLML/dl = 0.5 tr((aa^T - K^-1) dK/dl), dK/dl = s^2 e^{-d^2/2l^2} d^2/l^3
        [ref: tune_hyperparms_regression.py:54-59]."""
        x, y = _data(rng)
        sigma, ell = 1.0, 1.3
        k = ops.RBF()
        p = {"sigma": jnp.asarray(sigma), "lengthscale": jnp.asarray(ell)}
        g = jax.grad(
            lambda pp: gp.log_marginal_likelihood(k, pp, x, y, noise_variance=NOISE)
        )(p)

        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        K = sigma**2 * np.exp(-0.5 * d2 / ell**2) + NOISE * np.eye(len(x))
        Kinv = np.linalg.inv(K)
        alpha = Kinv @ y
        dK = sigma**2 * np.exp(-0.5 * d2 / ell**2) * (d2 / ell**3)
        want = 0.5 * np.trace((np.outer(alpha, alpha) - Kinv) @ dK)
        np.testing.assert_allclose(float(g["lengthscale"]), want, rtol=1e-7)


class TestGradientAscent:
    def test_improves_lml_and_converges(self, rng):
        x, y = _data(rng, n=10)
        k = ops.RBF()
        p0 = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(3.0)}
        lml0 = float(gp.log_marginal_likelihood(k, p0, x, y, noise_variance=NOISE))
        res = opt.tune_gradient_ascent(
            k,
            p0,
            x,
            y,
            noise_variance=NOISE,
            trainable={"sigma": False, "lengthscale": True},
            max_iters=2000,
        )
        assert float(res.lml) > lml0
        assert bool(res.converged)
        # sigma frozen like the reference [ref: tune_hyperparms_regression.py:401]
        np.testing.assert_allclose(float(res.params["sigma"]), 1.0)
        # trace is populated up to iters
        it = int(res.iters)
        assert np.isfinite(np.asarray(res.lml_trace)[: it]).all()

    def test_log_transform_keeps_positive(self, rng):
        x, y = _data(rng, n=8)
        k = ops.RBF()
        p0 = {"sigma": jnp.asarray(0.5), "lengthscale": jnp.asarray(0.1)}
        res = opt.tune_gradient_ascent(
            k, p0, x, y, transform="log", optimizer="adam",
            learning_rate=0.05, max_iters=500,
        )
        assert float(res.params["lengthscale"]) > 0
        assert float(res.params["sigma"]) > 0

    def test_jittable_end_to_end(self, rng):
        x, y = _data(rng, n=5)
        k = ops.RBF()
        p0 = k.init_params()
        f = jax.jit(
            lambda xx, yy: opt.tune_gradient_ascent(k, p0, xx, yy, max_iters=50).lml
        )
        assert np.isfinite(float(f(jnp.asarray(x), jnp.asarray(y))))


class TestBayesianOpt:
    @pytest.mark.parametrize("acq", ["PI", "EI", "UCB", "TS"])
    def test_all_acquisitions_improve(self, rng, acq):
        """All four acquisitions must actually dispatch (the reference's
        dispatcher always returns PI — quirk Q5) and find a lengthscale at
        least as good as the initial guesses."""
        x, y = _data(rng, n=8)
        k = ops.RBF()

        def objective(v):
            p = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(float(v[0]))}
            return float(gp.log_marginal_likelihood(k, p, x, y, noise_variance=NOISE))

        init = np.array([[0.3], [4.0]])  # two initial points [ref: :427]
        res = opt.tune_bayesian_opt(
            objective,
            init,
            (np.array([0.01]), np.array([5.0])),
            n_iterations=4,
            n_candidates=60,
            acquisition=acq,
            seed=3,
        )
        assert res.best_value >= max(objective(init[0]), objective(init[1])) - 1e-12
        assert res.points.shape[0] >= 2

    def test_acquisition_math(self):
        mean = jnp.asarray([0.0, 1.0, 2.0])
        std = jnp.asarray([1.0, 1.0, 1.0])
        assert opt.acquisition_ei(mean, std, 0.5) == 2
        assert opt.acquisition_ucb(mean, std, kappa=0.1) == 2
        # PI early-stops when nothing can improve
        assert (
            opt.acquisition_pi(mean, jnp.full(3, 1e-9), best_y=100.0) is None
        )

    def test_co2_style_surrogate_params_fn(self, rng):
        """CO2 pipeline keys its composite surrogate on the first training
        point [ref: CO2_example.py:162]."""
        x, y = _data(rng, n=6)
        k = ops.RBF()

        def objective(v):
            p = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(float(v[0]))}
            return float(gp.log_marginal_likelihood(k, p, x, y, noise_variance=NOISE))

        res = opt.tune_bayesian_opt(
            objective,
            np.array([[1.0], [2.0]]),
            (np.array([0.01]), np.array([5.0])),
            n_iterations=2,
            n_candidates=30,
            surrogate_kernel=ops.RBF(),
            surrogate_params_fn=lambda pts: {
                "sigma": jnp.asarray(1.0),
                "lengthscale": jnp.asarray(max(float(pts[0, 0]), 0.1)),
            },
            seed=1,
        )
        assert np.isfinite(res.best_value)


class TestBOPaddedSurrogate:
    def test_padded_posterior_matches_unpadded(self, rng):
        """Masked padding must be invisible: the padded surrogate posterior
        (capacity 8, 5 valid points) equals the plain exact-GP posterior on
        the 5 points — the block-diagonal chol(K_valid) (+) I construction."""
        from gaussian_process_tpu.opt import bo as _bo

        k = ops.RBF()
        sp = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.7)}
        pts = rng.uniform(-2, 2, size=(5, 2))
        vals = rng.standard_normal(5)
        cands = rng.uniform(-2, 2, size=(9, 2))
        noise = 1e-4

        cap = 8
        x_pad = np.repeat(pts[:1], cap, axis=0)
        x_pad[:5] = pts
        y_pad = np.zeros(cap)
        y_pad[:5] = vals
        padded = _bo._surrogate_posterior_padded(
            k, sp, jnp.asarray(x_pad), jnp.asarray(y_pad),
            jnp.asarray(5, jnp.int32), jnp.asarray(cands), noise,
        )
        plain = gp.posterior(k, sp, pts, vals, cands, noise_variance=noise)
        np.testing.assert_allclose(np.asarray(padded.mean), np.asarray(plain.mean), atol=1e-10)
        np.testing.assert_allclose(np.asarray(padded.var), np.asarray(plain.var), atol=1e-10)
        np.testing.assert_allclose(float(padded.lml), float(plain.lml), rtol=1e-10)
        # padded alpha rows are exactly zero; valid rows match
        np.testing.assert_allclose(np.asarray(padded.alpha)[5:], 0.0, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(padded.alpha)[:5], np.asarray(plain.alpha), atol=1e-9
        )

    def test_surrogate_compiles_once_per_bucket(self, rng):
        """A 20-iteration search must trace the surrogate once per capacity
        bucket (k grows 2->22: caps 8/16/32 = 3 traces), not once per
        iteration [VERDICT r2 weak #4: opt/bo.py re-jitted on the growing
        point set every step]."""
        from gaussian_process_tpu.opt import bo as _bo

        x, y = _data(rng, n=8)
        k = ops.RBF()

        def objective(v):
            p = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(float(v[0]))}
            return float(gp.log_marginal_likelihood(k, p, x, y, noise_variance=NOISE))

        before = _bo._surrogate_posterior_padded._cache_size()
        res = opt.tune_bayesian_opt(
            objective,
            np.array([[0.3], [4.0]]),
            (np.array([0.01]), np.array([5.0])),
            n_iterations=20,
            n_candidates=40,
            acquisition="UCB",
            seed=7,
        )
        traces = _bo._surrogate_posterior_padded._cache_size() - before
        n_evals = len(res.values)
        assert n_evals > 8, "search must cross at least one bucket boundary"
        buckets = len({_bo._padded_capacity(kk) for kk in range(2, n_evals + 1)})
        assert traces <= buckets, (traces, buckets, n_evals)


class TestBODedupAndResume:
    def test_dedup_candidates(self):
        """Proposals coinciding with evaluated points are dropped — the
        reference's overlap [ref: tune_hyperparms_regression.py:316-329]."""
        pts = np.array([[1.0, 2.0], [3.0, 4.0]])
        cands = np.array([[1.0, 2.0], [1.0, 2.1], [5.0, 6.0], [3.0, 4.0]])
        fresh = opt.dedup_candidates(cands, pts)
        np.testing.assert_array_equal(fresh, [[1.0, 2.1], [5.0, 6.0]])

    def test_bo_never_reevaluates(self, rng):
        seen = []

        def objective(v):
            key = tuple(np.round(np.asarray(v, float), 12))
            assert key not in seen, f"re-evaluated {key}"
            seen.append(key)
            return -float(((np.asarray(v) - 2.0) ** 2).sum())

        res = opt.tune_bayesian_opt(
            objective,
            np.array([[1.0], [3.0]]),
            (np.array([0.0]), np.array([5.0])),
            n_iterations=6,
            n_candidates=25,
            acquisition="EI",
            seed=0,
        )
        assert len(res.values) == len(seen)

    def test_bo_stops_when_box_exhausted(self):
        """A degenerate box (single point, already evaluated) must stop
        instead of re-evaluating forever."""
        calls = []

        def objective(v):
            calls.append(1)
            return 0.0

        res = opt.tune_bayesian_opt(
            objective,
            np.array([[1.0]]),
            (np.array([1.0]), np.array([1.0])),  # zero-volume box
            n_iterations=5,
            n_candidates=10,
        )
        assert res.stopped_early
        assert len(calls) == 1  # only the initial point

    def test_bo_checkpoint_resume(self, tmp_path, rng):
        """Kill-resume: a second run with the same checkpoint dir continues
        from the stored history without re-evaluating the objective."""
        ckdir = str(tmp_path / "bo_ck")
        calls_a, calls_b = [], []

        def make_objective(calls):
            def objective(v):
                calls.append(float(np.asarray(v).ravel()[0]))
                return -float(((np.asarray(v) - 2.0) ** 2).sum())
            return objective

        res_a = opt.tune_bayesian_opt(
            make_objective(calls_a),
            np.array([[1.0]]),
            (np.array([0.0]), np.array([5.0])),
            n_iterations=3,
            n_candidates=20,
            acquisition="EI",
            seed=3,
            checkpoint_dir=ckdir,
        )
        # "crashed" after 3 iterations; resume and extend to 5
        res_b = opt.tune_bayesian_opt(
            make_objective(calls_b),
            np.array([[1.0]]),
            (np.array([0.0]), np.array([5.0])),
            n_iterations=5,
            n_candidates=20,
            acquisition="EI",
            seed=3,
            checkpoint_dir=ckdir,
        )
        # resume did not replay the first run's evaluations
        assert len(calls_b) <= 2
        assert len(res_b.values) >= len(res_a.values)
        np.testing.assert_array_equal(
            res_b.points[: len(res_a.points)], res_a.points
        )
        assert res_b.best_value >= res_a.best_value
