"""Pallas tile kernels vs the dense XLA path (interpret mode on CPU).

SURVEY.md sec. 4 item 1: 'Pallas kernel-matrix tiles vs jnp dense reference'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_tpu import ops
from gaussian_process_tpu.ops import pallas as pops

BOOK = np.array([66, 67, 2.4, 90, 1.3, 0.66, 1.2, 0.78, 0.18, 1.6, 0.19])


def _x(rng, n, d):
    return rng.uniform(-5, 5, size=(n, d)).astype(np.float32)


class TestPallasGram:
    @pytest.mark.parametrize("n,m,d", [(300, 200, 3), (256, 256, 1), (40, 513, 7)])
    def test_rbf_matches_xla(self, rng, n, m, d):
        a, b = _x(rng, n, d), _x(rng, m, d)
        k = ops.RBF()
        p = {"sigma": jnp.asarray(1.5), "lengthscale": jnp.asarray(0.8)}
        got = pops.gram(k, p, a, b, interpret=True)
        want = ops.gram(k, p, jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_same_set_white_diagonal(self, rng):
        a = _x(rng, 100, 2)
        k = ops.co2_kernel()
        p = ops.co2_params_from_vector(jnp.asarray(BOOK, jnp.float32))
        got = pops.gram(k, p, a, interpret=True)
        want = ops.gram(k, p, jnp.asarray(a, jnp.float32))
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-3)

    @pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
    def test_matern_matches_xla(self, rng, nu):
        a, b = _x(rng, 130, 2), _x(rng, 70, 2)
        k = ops.Matern(nu=nu)
        p = {"sigma": jnp.asarray(1.2), "lengthscale": jnp.asarray(0.9)}
        got = pops.gram(k, p, a, b, interpret=True)
        want = ops.gram(k, p, jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_rejects_nonstationary(self, rng):
        a = _x(rng, 16, 2)
        with pytest.raises(ValueError):
            pops.gram(ops.Linear(), ops.Linear().init_params(), a, a, interpret=True)


class TestPallasMatvec:
    @pytest.mark.parametrize("r", [None, 1, 4])
    def test_matches_dense_matvec(self, rng, r):
        a, b = _x(rng, 300, 3), _x(rng, 200, 3)
        v = rng.standard_normal((200,) if r is None else (200, r)).astype(np.float32)
        k = ops.RBF()
        p = k.init_params()
        got = pops.gram_matvec(k, p, a, b, jnp.asarray(v), interpret=True)
        K = ops.gram(k, p, jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
        want = np.asarray(K) @ v
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_same_set_with_white(self, rng):
        a = _x(rng, 130, 2)
        v = rng.standard_normal(130).astype(np.float32)
        k = ops.RBF() + ops.White()
        p = (ops.RBF().init_params(), {"amplitude": jnp.asarray(0.5)})
        got = pops.gram_matvec(k, p, a, None, jnp.asarray(v), interpret=True)
        K = ops.gram(k, p, jnp.asarray(a, jnp.float32))
        np.testing.assert_allclose(got, np.asarray(K) @ v, rtol=2e-4, atol=2e-4)

    def test_tile_size_invariance(self, rng):
        a = _x(rng, 100, 2)
        v = rng.standard_normal(100).astype(np.float32)
        k = ops.RBF()
        p = k.init_params()
        g1 = pops.gram_matvec(k, p, a, None, jnp.asarray(v), tile_m=64, tile_n=64, interpret=True)
        g2 = pops.gram_matvec(k, p, a, None, jnp.asarray(v), tile_m=256, tile_n=128, interpret=True)
        np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=2e-5)


class TestSymmetricMatvec:
    """The upper-triangle same-set sweep (_matvec_fwd_sym_impl) — the
    kernel powering the cg100k/204800/409600 headline rows — exercised in
    interpret mode at small n (ADVICE r4 medium #2: it previously had zero
    automated parity coverage because it only auto-enables at n >= 2048)."""

    @pytest.mark.parametrize("n,r", [(300, 1), (256, 3), (193, 2)])
    def test_parity_vs_full_sweep_rbf(self, rng, n, r):
        # tile 64 with ragged n covers multi-tile grids incl. a partial
        # final tile (300 = 4*64 + 44)
        a = _x(rng, n, 2)
        v = rng.standard_normal((n, r)).astype(np.float32)
        k = ops.RBF()
        p = {"sigma": jnp.asarray(1.3), "lengthscale": jnp.asarray(0.7)}
        sym = pops.gram_matvec(k, p, a, None, jnp.asarray(v),
                               tile_m=64, tile_n=64, interpret=True,
                               symmetric=True)
        full = pops.gram_matvec(k, p, a, None, jnp.asarray(v),
                                tile_m=64, tile_n=64, interpret=True,
                                symmetric=False)
        np.testing.assert_allclose(np.asarray(sym), np.asarray(full),
                                   rtol=2e-4, atol=2e-4)
        K = ops.gram(k, p, jnp.asarray(a, jnp.float32))
        np.testing.assert_allclose(np.asarray(sym), np.asarray(K) @ v,
                                   rtol=2e-3, atol=2e-3)

    def test_parity_sum_kernel_with_white(self, rng):
        a = _x(rng, 200, 3)
        v = rng.standard_normal((200, 2)).astype(np.float32)
        k = ops.RBF() + ops.White()
        p = (ops.RBF().init_params(), {"amplitude": jnp.asarray(0.5)})
        sym = pops.gram_matvec(k, p, a, None, jnp.asarray(v),
                               tile_m=64, tile_n=64, interpret=True,
                               symmetric=True)
        K = ops.gram(k, p, jnp.asarray(a, jnp.float32))
        np.testing.assert_allclose(np.asarray(sym), np.asarray(K) @ v,
                                   rtol=2e-3, atol=2e-3)

    def test_parity_matern(self, rng):
        a = _x(rng, 150, 2)
        v = rng.standard_normal((150, 1)).astype(np.float32)
        k = ops.Matern(nu=1.5)
        p = {"sigma": jnp.asarray(1.1), "lengthscale": jnp.asarray(0.9)}
        sym = pops.gram_matvec(k, p, a, None, jnp.asarray(v),
                               tile_m=64, tile_n=64, interpret=True,
                               symmetric=True)
        K = ops.gram(k, p, jnp.asarray(a, jnp.float32))
        np.testing.assert_allclose(np.asarray(sym), np.asarray(K) @ v,
                                   rtol=2e-3, atol=2e-3)

    def test_dot_mode_highest_parity(self, rng):
        """dot_mode='highest' (the tight-tolerance fallback, ADVICE r4
        medium #1) agrees with the dense product tighter than split3."""
        a = _x(rng, 200, 2)
        v = rng.standard_normal((200, 2)).astype(np.float32)
        k = ops.RBF()
        p = k.init_params()
        K = np.asarray(ops.gram(k, p, jnp.asarray(a, jnp.float32)),
                       np.float64)
        want = K @ v.astype(np.float64)
        scale = np.max(np.abs(want))
        for sym_flag in (True, False):
            hi = np.asarray(pops.gram_matvec(
                k, p, a, None, jnp.asarray(v), tile_m=64, tile_n=64,
                interpret=True, symmetric=sym_flag, dot_mode="highest",
            ), np.float64)
            assert np.max(np.abs(hi - want)) / scale < 3e-6

    def test_vjp_through_symmetric_path(self, rng):
        """Gradients flow through symmetric=True (the backward pass uses
        the full sweeps; parity vs XLA dense autodiff)."""
        n, d, r = 96, 2, 2
        x = jnp.asarray(rng.uniform(-3, 3, (n, d)))
        v = jnp.asarray(rng.standard_normal((n, r)))
        w = jnp.asarray(rng.standard_normal((n, r)))
        kern = ops.RBF()
        p = {"sigma": jnp.asarray(1.2), "lengthscale": jnp.asarray(0.9)}

        def loss_sym(p, x, v):
            return jnp.sum(pops.gram_matvec(
                kern, p, x, None, v, tile_m=32, tile_n=32,
                interpret=True, symmetric=True, dtype=jnp.float64,
            ) * w)

        def loss_xla(p, x, v):
            return jnp.sum((ops.gram(kern, p, x) @ v) * w)

        np.testing.assert_allclose(float(loss_sym(p, x, v)),
                                   float(loss_xla(p, x, v)), rtol=1e-6)
        g1 = jax.grad(loss_sym, argnums=(0, 1, 2))(p, x, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(p, x, v)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6,
                                                    atol=1e-10),
            g1, g2,
        )


class TestGramMatvecVJP:
    """gram_matvec's custom VJP (backward = fused Pallas tile sweeps) vs
    XLA dense autodiff (VERDICT round 1, item 9)."""

    def test_grads_match_xla(self, rng):
        n, m, d, r = 48, 40, 3, 2
        x1 = jnp.asarray(rng.uniform(-3, 3, (n, d)))
        x2 = jnp.asarray(rng.uniform(-3, 3, (m, d)))
        v = jnp.asarray(rng.standard_normal((m, r)))
        w = jnp.asarray(rng.standard_normal((n, r)))
        kern = ops.RBF()
        p = {"sigma": jnp.asarray(1.2), "lengthscale": jnp.asarray(0.9)}

        def loss_pallas(p, x1, x2, v):
            return jnp.sum(
                pops.gram_matvec(kern, p, x1, x2, v, dtype=jnp.float64) * w
            )

        def loss_xla(p, x1, x2, v):
            return jnp.sum((ops.gram(kern, p, x1, x2) @ v) * w)

        assert np.isclose(
            float(loss_pallas(p, x1, x2, v)), float(loss_xla(p, x1, x2, v))
        )
        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(p, x1, x2, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(p, x1, x2, v)
        # rtol 1e-6: tile-local vs dense reduction orders differ slightly
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-10),
            g1,
            g2,
        )

    def test_same_set_with_white(self, rng):
        n, d = 40, 2
        x = jnp.asarray(rng.uniform(-3, 3, (n, d)))
        v = jnp.asarray(rng.standard_normal(n))
        w = jnp.asarray(rng.standard_normal(n))
        kern = ops.RBF() + ops.White()
        p = (
            {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(1.1)},
            {"amplitude": jnp.asarray(0.5)},
        )

        def lp(p):
            return jnp.sum(
                pops.gram_matvec(kern, p, x, None, v, dtype=jnp.float64) * w
            )

        def lx(p):
            return jnp.sum((ops.gram(kern, p, x) @ v) * w)

        np.testing.assert_allclose(float(lp(p)), float(lx(p)), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-12),
            jax.grad(lp)(p),
            jax.grad(lx)(p),
        )

    def test_cg_lml_quadratic_grad_matches_dense(self, rng):
        """The VERDICT item-9 done criterion: jax.grad through a CG
        objective using the Pallas matvec matches the XLA dense path."""
        from gaussian_process_tpu.linalg.cg import cg_solve_grad

        n, d = 200, 3
        x = jnp.asarray(rng.uniform(-3, 3, (n, d)))
        y = jnp.asarray(rng.standard_normal(n))
        kern = ops.RBF()
        noise = 1e-2

        def mv(p, v):
            vv = v[:, None] if v.ndim == 1 else v
            out = pops.gram_matvec(kern, p, x, None, vv, dtype=jnp.float64)
            out = out[:, 0] if v.ndim == 1 else out
            return out + noise * v

        def quad_cg(p):
            return 0.5 * jnp.dot(y, cg_solve_grad(mv, 1e-12, 2000, p, y))

        def quad_dense(p):
            Km = ops.gram(kern, p, x) + noise * jnp.eye(n, dtype=jnp.float64)
            return 0.5 * jnp.dot(y, jnp.linalg.solve(Km, y))

        p = {"sigma": jnp.asarray(1.1), "lengthscale": jnp.asarray(0.8)}
        np.testing.assert_allclose(float(quad_cg(p)), float(quad_dense(p)), rtol=1e-8)
        g1, g2 = jax.grad(quad_cg)(p), jax.grad(quad_dense)(p)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), g1, g2
        )


class TestGramAD:
    """gram_ad: Pallas forward + XLA-derived custom-VJP gradients — the
    production gram dispatch in gp/regression.py (r4)."""

    def test_forward_matches_xla(self, rng):
        from gaussian_process_tpu.ops import pallas as pops
        from gaussian_process_tpu.ops import kernels as k_mod

        x = jnp.asarray(rng.uniform(-5, 5, (48, 3)), jnp.float32)
        k = ops.RBF() + ops.White()
        p = (ops.RBF().init_params(), {"amplitude": jnp.asarray(0.3, jnp.float32)})
        got = pops.gram_ad(k, p, x)
        want = k_mod.gram(k, p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        # cross-set: White contributes nothing
        x2 = jnp.asarray(rng.uniform(-5, 5, (17, 3)), jnp.float32)
        got_c = pops.gram_ad(k, p, x, x2)
        want_c = k_mod.gram(k, p, x, x2)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_matches_xla_gram(self, rng):
        from gaussian_process_tpu.ops import pallas as pops
        from gaussian_process_tpu.ops import kernels as k_mod

        x = jnp.asarray(rng.uniform(-5, 5, (32, 2)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
        k = ops.RBF()

        def loss_pallas(p, x):
            return jnp.sum(w * pops.gram_ad(k, p, x))

        def loss_xla(p, x):
            return jnp.sum(w * k_mod.gram(k, p, x))

        p = {"sigma": jnp.asarray(1.3, jnp.float32),
             "lengthscale": jnp.asarray(0.8, jnp.float32)}
        gp_, gx_ = jax.grad(loss_pallas, argnums=(0, 1))(p, x)
        gp0, gx0 = jax.grad(loss_xla, argnums=(0, 1))(p, x)
        np.testing.assert_allclose(float(gp_["sigma"]), float(gp0["sigma"]), rtol=1e-4)
        np.testing.assert_allclose(float(gp_["lengthscale"]),
                                   float(gp0["lengthscale"]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gx_), np.asarray(gx0),
                                   rtol=1e-4, atol=1e-5)
