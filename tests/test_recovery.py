"""Fault injection for the restart re-dispatch driver (SURVEY.md §5,
failure-detection row): lost shards (NaN results) and whole-attempt failures
(raised exceptions) are detected and re-dispatched; results stay correct."""

import numpy as np
import pytest

from gaussian_process_tpu.parallel import recovery


def _candidates(n):
    return {"lengthscale": np.linspace(0.5, 2.0, n), "sigma": np.ones(n)}


def _true_values(cand):
    return cand["lengthscale"] * 10.0  # stand-in for LML(θ)


class TestRedispatch:
    def test_no_failures_single_attempt(self):
        cand = _candidates(6)
        res = recovery.run_with_redispatch(_true_values, cand)
        np.testing.assert_allclose(res.values, _true_values(cand))
        assert res.attempts == 1 and res.redispatched == 0 and res.ok.all()

    def test_nan_shards_are_redispatched(self):
        cand = _candidates(8)

        def inject(attempt, out):
            if attempt == 1:  # lose half the shard results on the first try
                out = out.copy()
                out[::2] = np.nan
            return out

        res = recovery.run_with_redispatch(
            _true_values, cand, inject_failure=inject, max_attempts=3
        )
        np.testing.assert_allclose(res.values, _true_values(cand))
        assert res.ok.all()
        assert res.attempts == 2
        assert res.redispatched == 4  # the four lost candidates re-ran

    def test_raising_attempt_is_retried(self):
        cand = _candidates(4)
        calls = {"n": 0}

        def flaky(batch):
            calls["n"] += 1
            if calls["n"] == 1:  # simulated device loss on attempt 1
                raise RuntimeError("device lost")
            return _true_values(batch)

        res = recovery.run_with_redispatch(flaky, cand, max_attempts=3)
        np.testing.assert_allclose(res.values, _true_values(cand))
        assert res.ok.all() and res.attempts == 2

    def test_unrecoverable_candidate_reported(self):
        cand = _candidates(4)

        def always_nan_first(batch):
            out = _true_values(batch)
            out = np.asarray(out).copy()
            out[0] = np.nan  # index 0 of whatever batch is pending
            return out

        res = recovery.run_with_redispatch(
            always_nan_first, cand, max_attempts=2
        )
        assert not res.ok.all() and np.isnan(res.values[~res.ok]).all()
        assert res.ok.sum() >= 2

    def test_batch_granularity_padding(self):
        cand = _candidates(5)

        def eval_fn(batch):
            n = len(batch["lengthscale"])
            assert n % 4 == 0, n  # mesh-axis granularity respected
            return _true_values(batch)

        res = recovery.run_with_redispatch(
            eval_fn, cand, batch_granularity=4
        )
        np.testing.assert_allclose(res.values, _true_values(cand))

    def test_sharded_lml_integration(self):
        """End-to-end: re-dispatch around the real sharded LML evaluator."""
        import jax
        import jax.numpy as jnp

        from gaussian_process_tpu import gp, ops, parallel

        mesh = parallel.make_mesh(restart=4, data=2)
        kernel = ops.RBF()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-5, 5, (16, 2)))
        y = jnp.asarray(np.sin(np.asarray(x).sum(axis=1)))
        fn = parallel.make_sharded_lml(kernel, mesh=mesh)

        cand = {
            "sigma": np.ones(8),
            "lengthscale": np.linspace(0.5, 2.0, 8),
        }

        def inject(attempt, out):
            if attempt == 1:
                out = out.copy()
                out[3] = np.nan  # one lost shard
            return out

        res = recovery.run_with_redispatch(
            lambda b: fn(jax.tree_util.tree_map(jnp.asarray, b), x, y),
            cand,
            batch_granularity=4,
            inject_failure=inject,
        )
        assert res.ok.all() and res.attempts == 2
        for i in (0, 3, 7):
            p = {k: jnp.asarray(v[i]) for k, v in cand.items()}
            want = float(gp.log_marginal_likelihood(kernel, p, x, y))
            assert abs(res.values[i] - want) / abs(want) < 1e-8
