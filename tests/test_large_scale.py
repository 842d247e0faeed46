"""Matrix-free LML training (opt/large_scale.py): the gradient estimator
must agree with jax.grad of the exact LML, and ascent must improve it."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_process_tpu import gp, ops
from gaussian_process_tpu.opt.large_scale import lml_surrogate, tune_large_scale

NOISE = 1e-2


def _problem(rng, n=500):
    x = jnp.asarray(rng.uniform(-5, 5, (n, 3)))
    y = jnp.asarray(np.sin(0.9 * np.asarray(x).sum(1)) + 0.05 * rng.standard_normal(n))
    return x, y


def test_gradient_estimator_matches_exact(rng):
    x, y = _problem(rng)
    k = ops.RBF()
    p = {"sigma": jnp.asarray(1.3), "lengthscale": jnp.asarray(1.7)}
    g_exact = jax.grad(
        lambda pp: gp.log_marginal_likelihood(k, pp, x, y, noise_variance=NOISE)
    )(p)
    g_est = jax.grad(
        lambda pp: lml_surrogate(
            k, pp, x, y, jax.random.key(1), noise_variance=NOISE,
            num_probes=64, cg_tol=1e-10, cg_max_iters=3000,
            precond_rank=96, use_pallas=False,
        )
    )(p)
    for kk in g_exact:
        a, b = float(g_exact[kk]), float(g_est[kk])
        # quadratic term is exact; logdet term is a 64-probe MC estimate
        assert abs(a - b) / max(abs(a), 1e-9) < 0.1, (kk, a, b)


def test_quadratic_value_is_exact(rng):
    """The surrogate's value = exact quadratic term + a params-independent
    probe constant (-n/2 per probe mean) - n/2 log 2pi."""
    x, y = _problem(rng, n=300)
    k = ops.RBF()
    p = k.init_params()
    val = float(
        lml_surrogate(k, p, x, y, jax.random.key(0), noise_variance=NOISE,
                      num_probes=4, cg_tol=1e-12, cg_max_iters=3000,
                      precond_rank=64, use_pallas=False)
    )
    post = gp.posterior(k, p, x, y, x[:2], noise_variance=NOISE)
    quad_exact = -0.5 * float(jnp.dot(y, post.alpha))
    n = x.shape[0]
    expected = quad_exact - 0.5 * n - 0.5 * n * np.log(2 * np.pi)
    assert abs(val - expected) < 1e-5 * max(abs(expected), 1.0)


def test_training_improves_exact_lml(rng):
    x, y = _problem(rng, n=400)
    k = ops.RBF()
    p = {"sigma": jnp.asarray(1.3), "lengthscale": jnp.asarray(1.7)}
    lml0 = float(gp.log_marginal_likelihood(k, p, x, y, noise_variance=NOISE))
    res = tune_large_scale(
        k, p, x, y, noise_variance=NOISE, steps=10, num_probes=8,
        cg_tol=1e-6, cg_max_iters=1000, precond_rank=64,
        learning_rate=0.1, use_pallas=False,
    )
    lml1 = float(gp.log_marginal_likelihood(k, res.params, x, y, noise_variance=NOISE))
    assert lml1 > lml0 + 1.0
    assert np.isfinite(res.lml_trace).all()


def test_slq_logdet_matches_dense(rng):
    from gaussian_process_tpu.opt.large_scale import slq_logdet

    n = 500
    x = jnp.asarray(rng.uniform(-5, 5, (n, 3)))
    k = ops.RBF()
    p = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(1.5)}
    K = np.asarray(ops.gram(k, p, x)) + NOISE * np.eye(n)
    true_logdet = float(np.linalg.slogdet(K)[1])
    est = float(
        slq_logdet(k, p, x, jax.random.key(0), noise_variance=NOISE,
                   num_probes=16, lanczos_iters=40, use_pallas=False)
    )
    assert abs(est - true_logdet) / abs(true_logdet) < 0.02


def test_lml_estimate_matches_exact(rng):
    from gaussian_process_tpu.opt.large_scale import lml_estimate

    x, y = _problem(rng, n=500)
    k = ops.RBF()
    p = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(1.5)}
    true_lml = float(gp.log_marginal_likelihood(k, p, x, y, noise_variance=NOISE))
    est = float(
        lml_estimate(k, p, x, y, jax.random.key(0), noise_variance=NOISE,
                     num_probes=16, lanczos_iters=40, precond_rank=96,
                     use_pallas=False)
    )
    # SLQ's MC error is absolute on the logdet scale (O(n)); the LML
    # itself can be near zero, so bound the absolute error relative to n
    assert abs(est - true_lml) < 0.01 * x.shape[0]
