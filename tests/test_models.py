"""Estimator-facade tests: the sklearn-style classes must agree with the
functional core they wrap and hit the reference's quality bars
(accuracy metrics [ref: GP_binary_classification.py:241,
GP_multi_classification.py:253])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_tpu import gp, ops
from gaussian_process_tpu.models import (
    GPBinaryClassifier,
    GPMulticlassClassifier,
    GPRegressor,
)
from gaussian_process_tpu.utils import datasets


class TestGPRegressor:
    def test_matches_functional_posterior(self, rng):
        x = rng.uniform(-5, 5, (40, 2))
        y = np.sin(x.sum(1))
        xt = rng.uniform(-5, 5, (15, 2))
        k = ops.RBF()
        model = GPRegressor(k, noise_variance=5e-4).fit(x, y)
        mean, std = model.predict(xt, return_std=True)
        post = gp.posterior(k, k.init_params(), jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(xt), noise_variance=5e-4)
        np.testing.assert_allclose(mean, post.mean, rtol=1e-10)
        np.testing.assert_allclose(std, post.std, rtol=1e-10)
        np.testing.assert_allclose(model.log_marginal_likelihood(), post.lml, rtol=1e-10)

    def test_optimize_improves_lml(self, rng):
        _, x, y, _ = datasets.sine_regression(30, 10, seed=3)
        k = ops.RBF()
        base = GPRegressor(k).fit(x, y)
        tuned = GPRegressor(k).fit(x, y, optimize=True, max_iters=200)
        assert float(tuned.lml_) >= float(base.lml_) - 1e-6

    def test_sample_shapes(self, rng):
        x = rng.uniform(-5, 5, (20, 1))
        y = np.sin(x[:, 0])
        xt = rng.uniform(-5, 5, (9, 1))
        model = GPRegressor(ops.RBF()).fit(x, y)
        s = model.sample(xt, jax.random.PRNGKey(0), num_functions=4)
        assert s.shape == (9, 4)
        assert np.isfinite(np.asarray(s)).all()


class TestGPBinaryClassifier:
    def test_moons_accuracy(self):
        xtr, xte, ytr, yte = datasets.binary_dataset("moons", seed=0)
        model = GPBinaryClassifier(ops.RBF()).fit(xtr, ytr)
        acc = model.score(xte, yte)
        assert acc >= 0.8  # the reference prints ~0.8-1.0 on moons
        proba = np.asarray(model.predict_proba(xte))
        assert ((proba >= 0) & (proba <= 1)).all()

    def test_labels_are_pm1(self):
        xtr, xte, ytr, _ = datasets.binary_dataset("moons", seed=1)
        labels = np.asarray(GPBinaryClassifier(ops.RBF()).fit(xtr, ytr).predict(xte))
        assert set(np.unique(labels)) <= {-1.0, 1.0}


class TestGPMulticlassClassifier:
    def test_blobs_accuracy(self):
        xtr, xte, ytr, yte = datasets.blobs_multiclass(seed=0)
        model = GPMulticlassClassifier(ops.RBF(), num_classes=3).fit(xtr, ytr)
        acc = model.score(xte, yte)
        assert acc >= 0.8
        proba = np.asarray(model.predict_proba(xte))
        np.testing.assert_allclose(proba.sum(axis=0), 1.0, rtol=1e-5)

    def test_unfitted_raises(self):
        import pytest

        with pytest.raises(RuntimeError):
            GPMulticlassClassifier(ops.RBF(), 3).predict(np.zeros((2, 2)))


def test_regressor_cg_solver_matches_cholesky(rng):
    import jax.numpy as jnp

    from gaussian_process_tpu.models import GPRegressor
    from gaussian_process_tpu import ops

    x = rng.uniform(-5, 5, (300, 2)).astype(np.float64)
    y = np.sin(0.9 * x.sum(1))
    xt = rng.uniform(-5, 5, (25, 2)).astype(np.float64)
    m = GPRegressor(ops.RBF(), noise_variance=1e-2).fit(x, y)
    mean_c, std_c = m.predict(xt, return_std=True, solver="cholesky")
    mean_g, std_g = m.predict(xt, return_std=True, solver="cg")
    # default CG tolerance (1e-6 residual) -> ~1e-4 relative agreement
    np.testing.assert_allclose(mean_g, mean_c, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(std_g, std_c, rtol=1e-3, atol=1e-6)


class TestPosteriorWhitened:
    def test_matches_plain_posterior_f64(self, rng):
        """Facade route to gp.whitened_posterior: in f64 the whitening is a
        reparameterisation, so it must reproduce posterior() exactly."""
        import jax.numpy as jnp

        x = rng.uniform(-5, 5, (64, 2))
        y = np.sin(x.sum(1)) + 0.05 * rng.standard_normal(64)
        xt = rng.uniform(-5, 5, (16, 2))
        m = GPRegressor(ops.RBF(), noise_variance=1e-3).fit(x, y)
        w = m.posterior_whitened(xt, dtype=jnp.float64)
        ref = m.posterior(xt)
        np.testing.assert_allclose(np.asarray(w.mean), np.asarray(ref.mean), atol=1e-9)
        np.testing.assert_allclose(np.asarray(w.std), np.asarray(ref.std), atol=1e-9)
        assert abs(float(w.lml) - float(ref.lml)) < 1e-7


class TestClassifierCGSolver:
    """solver="cg" on the classifier facades (r5): matrix-free fit/predict
    must reproduce the dense solver's labels and probabilities."""

    def test_binary_cg_matches_cholesky(self, rng):
        x = rng.uniform(-3, 3, (240, 2))
        y = np.where(np.sin(1.5 * x[:, 0]) - x[:, 1] > 0, 1.0, -1.0)
        xt = rng.uniform(-3, 3, (60, 2))
        a = GPBinaryClassifier(ops.RBF()).fit(x, y, solver="cholesky")
        b = GPBinaryClassifier(ops.RBF()).fit(x, y, solver="cg",
                                                     precond_rank=48)
        np.testing.assert_array_equal(np.asarray(a.predict(xt)),
                                      np.asarray(b.predict(xt)))
        np.testing.assert_allclose(np.asarray(a.predict_proba(xt)),
                                   np.asarray(b.predict_proba(xt)),
                                   rtol=1e-4, atol=1e-5)

    def test_multiclass_cg_matches_cholesky(self, rng):
        x = rng.uniform(-3, 3, (210, 2))
        ang = np.arctan2(x[:, 1], x[:, 0])
        y = ((ang + np.pi) / (2 * np.pi) * 3).astype(int) % 3
        xt = rng.uniform(-3, 3, (40, 2))
        a = GPMulticlassClassifier(ops.RBF(), 3).fit(
            x, y, solver="cholesky")
        b = GPMulticlassClassifier(ops.RBF(), 3).fit(
            x, y, solver="cg", precond_rank=48)
        np.testing.assert_array_equal(np.asarray(a.predict(xt)),
                                      np.asarray(b.predict(xt)))
        np.testing.assert_allclose(np.asarray(a.predict_proba(xt)),
                                   np.asarray(b.predict_proba(xt)),
                                   rtol=1e-4, atol=1e-5)

    def test_unknown_solver_raises(self, rng):
        x = rng.uniform(-3, 3, (20, 2))
        y = np.ones(20)
        with pytest.raises(ValueError):
            GPBinaryClassifier(ops.RBF()).fit(x, y, solver="qr")
