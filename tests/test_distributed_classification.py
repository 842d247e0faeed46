"""Distributed binary Laplace classification (r5): the whole true-Newton
iteration inside shard_map — ring kernel matvec, row-sharded W algebra,
per-step re-weighted sharded Nyström-Woodbury preconditioner — must
reproduce the single-chip matrix-free path on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_tpu import gp, ops, parallel


@pytest.fixture(scope="module")
def mesh8():
    return parallel.make_mesh(data=8)


def _problem(rng, n=800, m=64):
    x = jnp.asarray(rng.uniform(-3, 3, (n, 2)))
    f_true = np.sin(np.asarray(x).sum(axis=1))
    y = jnp.asarray(
        np.where(f_true + 0.3 * rng.standard_normal(n) > 0, 1.0, -1.0)
    )
    xt = jnp.asarray(rng.uniform(-3, 3, (m, 2)))
    k = ops.RBF()
    return k, k.init_params(), x, y, xt


class TestDistributedBinaryLaplace:
    def test_matches_single_chip_matrix_free(self, mesh8, rng):
        k, p, x, y, xt = _problem(rng)
        prob, pavg, label, mean, var, iters, inner, conv = (
            parallel.distributed_fit_predict_binary(
                k, p, x, y, xt, mesh=mesh8, precond_rank=64, cg_tol=1e-8,
            )
        )
        assert bool(conv)
        sc = gp.laplace_fit_cg(k, p, x, y, precond_rank=64,
                               use_pallas=False, cg_tol=1e-8)
        scp = gp.predict_binary_cg(k, p, sc, x, xt, use_pallas=False,
                                   cg_tol=1e-8)
        np.testing.assert_allclose(np.asarray(prob), np.asarray(scp.prob),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(var), np.asarray(scp.var),
                                   rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(pavg),
                                   np.asarray(scp.prob_averaged),
                                   rtol=1e-6, atol=1e-8)
        assert np.array_equal(np.asarray(label), np.asarray(scp.label))

    def test_padded_n_inert(self, mesh8, rng):
        """n=1000 is not divisible by 8 — padded rows (W = grad = 0, B
        acting as the identity) must not perturb anything."""
        k, p, x, y, xt = _problem(rng, n=1000)
        prob, _pa, label, _m, _v, _i, _ii, conv = (
            parallel.distributed_fit_predict_binary(
                k, p, x, y, xt, mesh=mesh8, precond_rank=64, cg_tol=1e-8,
            )
        )
        assert bool(conv)
        sc = gp.laplace_fit_cg(k, p, x, y, precond_rank=64,
                               use_pallas=False, cg_tol=1e-8)
        scp = gp.predict_binary_cg(k, p, sc, x, xt, use_pallas=False,
                                   cg_tol=1e-8)
        np.testing.assert_allclose(np.asarray(prob), np.asarray(scp.prob),
                                   rtol=1e-6, atol=1e-8)
        assert np.array_equal(np.asarray(label), np.asarray(scp.label))

    def test_accuracy_matches_dense(self, mesh8, rng):
        """End-to-end quality bar: distributed labels == dense-path labels
        on held-out points (the reference's printed metric,
        [ref: GP_binary_classification.py:241])."""
        k, p, x, y, xt = _problem(rng, n=640, m=160)
        _pr, _pa, label, *_rest = parallel.distributed_fit_predict_binary(
            k, p, x, y, xt, mesh=mesh8, precond_rank=64,
        )
        dense = gp.fit_binary(k, p, x, y)
        dpred = gp.predict_binary(k, p, dense, x, xt)
        agree = float(np.mean(np.asarray(label) == np.asarray(dpred.label)))
        assert agree == 1.0
