"""Distributed tests on the emulated 8-device CPU mesh (SURVEY.md sec. 4
item 4): sharded results must agree with single-device results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_tpu import gp, ops, parallel

NOISE = 5e-4


@pytest.fixture(scope="module")
def mesh():
    return parallel.make_mesh(data=4, restart=2)


def _data(n=64, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-5, 5, (n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    return x, y


class TestShardedGram:
    def test_matches_single_device(self, mesh):
        x, _ = _data()
        k = ops.RBF() + ops.White()
        p = (ops.RBF().init_params(), {"amplitude": jnp.asarray(0.3)})
        K_sharded = parallel.sharded_gram(k, p, x, mesh=mesh)
        K_ref = ops.gram(k, p, x)
        np.testing.assert_allclose(np.asarray(K_sharded), np.asarray(K_ref), rtol=1e-10)
        # really sharded: row-partitioned over the data axis
        assert K_sharded.sharding.spec[0] == "data"


class TestRingMatvec:
    def test_matches_dense(self, mesh):
        x, _ = _data()
        rng = np.random.default_rng(1)
        v = jnp.asarray(rng.standard_normal(64))
        k = ops.RBF() + ops.White()
        p = (ops.RBF().init_params(), {"amplitude": jnp.asarray(0.5)})
        y_ring = parallel.ring_matvec(k, p, x, v, mesh=mesh)
        y_ref = ops.gram(k, p, x) @ v
        np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_ref), rtol=1e-9, atol=1e-11)

    def test_mesh_size_invariance(self):
        """1-device and 4-device meshes must agree bit-for-bit modulo
        reduction order (f64 here, so tight)."""
        x, _ = _data(n=32)
        v = jnp.asarray(np.random.default_rng(2).standard_normal(32))
        k = ops.RBF()
        p = k.init_params()
        m1 = parallel.make_mesh(data=1, restart=1, devices=jax.devices()[:1])
        m4 = parallel.make_mesh(data=4, restart=1, devices=jax.devices()[:4])
        y1 = parallel.ring_matvec(k, p, x, v, mesh=m1)
        y4 = parallel.ring_matvec(k, p, x, v, mesh=m4)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y4), rtol=1e-12)


class TestDistributedCG:
    def test_posterior_mean_matches_cholesky(self, mesh):
        x, y = _data(n=64)
        x_test = jnp.asarray(np.random.default_rng(3).uniform(-5, 5, (16, 3)))
        k = ops.RBF()
        p = k.init_params()
        mean, alpha, iters, res = parallel.distributed_posterior_mean_cg(
            k, p, x, y, x_test, mesh=mesh, noise_variance=NOISE, tol=1e-10, max_iters=400
        )
        post = gp.posterior(k, p, x, y, x_test, noise_variance=NOISE)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(post.mean), rtol=1e-6, atol=1e-8)
        assert int(iters) < 400


class TestShardedRestarts:
    def test_lml_batch_matches_serial(self, mesh):
        x, y = _data(n=20, d=1)
        k = ops.RBF()
        ells = np.linspace(0.3, 3.0, 8)
        batch = {
            "sigma": jnp.ones(8),
            "lengthscale": jnp.asarray(ells),
        }
        lmls = parallel.sharded_lml(k, batch, x, y, mesh=mesh)
        want = [
            float(gp.log_marginal_likelihood(
                k, {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(e)}, x, y,
                noise_variance=NOISE))
            for e in ells
        ]
        np.testing.assert_allclose(np.asarray(lmls), want, rtol=1e-9)

    def test_gradient_restarts_improve(self, mesh):
        x, y = _data(n=16, d=1, seed=5)
        k = ops.RBF()
        rng = np.random.default_rng(0)
        batch = {
            "sigma": jnp.ones(8),
            "lengthscale": jnp.asarray(rng.uniform(0.2, 4.0, 8)),
        }
        params_out, lml_out, iters, conv = parallel.sharded_gradient_restarts(
            k, batch, x, y, mesh=mesh, max_iters=200,
            trainable={"sigma": False, "lengthscale": True},
        )
        lml_in = parallel.sharded_lml(k, batch, x, y, mesh=mesh)
        assert np.all(np.asarray(lml_out) >= np.asarray(lml_in) - 1e-9)
        best_p, best_v = parallel.best_restart(params_out, lml_out)
        assert np.isfinite(best_v)
