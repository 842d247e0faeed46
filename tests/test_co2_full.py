"""Reference-scale CO2 Bayesian optimisation (slow tier).

The reference's headline workload runs 4 acquisitions x 10 BO iterations x
500 candidates in a box around the GPML book hyperparameters and compares
each acquisition's best LML against the book LML
[ref: CO2_example.py:324 (theta_book), :330-379 (tune_hyperparameters_BO)].
This test executes that full configuration (f64, CPU backend — the
workload is n=526 and ill-conditioned) and asserts every acquisition's BO
search lands within tolerance of the book LML. ``examples/co2.py
--compare-acquisitions --bo-iters 10 --candidates 500`` is the same run
with artifacts; `artifacts/co2/` holds a committed record of it.

Note on the bar: the reference *prints* the comparison and draws a curve —
it asserts nothing [ref: CO2_example.py:362-379]. The committed full run
(artifacts/co2/run.jsonl, 2026-08-20: book LML 181.55; PI 292.92, EI
385.33, UCB 292.92, TS 383.94) shows every acquisition BEATING the book
LML over the 0.5x-1.5x book-anchored box, so the assertion here is that
each acquisition at least reaches the book's neighbourhood and the search
as a whole beats the book value.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gaussian_process_tpu import gp, ops  # noqa: E402
from gaussian_process_tpu.opt import tune_bayesian_opt  # noqa: E402
from gaussian_process_tpu.utils import datasets  # noqa: E402

THETA_BOOK = np.array(
    [66.0, 67.0, 2.4, 90.0, 1.3, 0.66, 1.2, 0.78, 0.18, 1.6, 0.19]
)


def test_reference_scale_co2_bo():
    import jax.numpy as jnp

    x_np, y_np, _ = datasets.mauna_loa()
    x = jnp.asarray(x_np, jnp.float64)
    y = jnp.asarray(y_np, jnp.float64)
    kernel = ops.co2_kernel()

    def lml_at(theta: np.ndarray) -> float:
        params = ops.co2_params_from_vector(jnp.asarray(theta, jnp.float64))
        return float(
            gp.log_marginal_likelihood(kernel, params, x, y, noise_variance=5e-4)
        )

    lml_book = lml_at(THETA_BOOK)
    assert np.isfinite(lml_book)

    lo = np.maximum(THETA_BOOK * 0.5, 1e-3)
    hi = THETA_BOOK * 1.5
    results = {}
    for acq in ("PI", "EI", "UCB", "TS"):
        bo = tune_bayesian_opt(
            lml_at,
            initial_points=THETA_BOOK[None, :] + 0.5,
            bounds=(lo, hi),
            n_iterations=10,  # [ref: CO2_example.py:330-379 (k < 10)]
            n_candidates=500,  # [ref: CO2_example.py:109-128 (500 draws)]
            acquisition=acq,
            seed=0,
        )
        results[acq] = bo.best_value
        # every acquisition must land in the book's neighbourhood (the
        # committed run beats it outright; 5% slack absorbs RNG drift if
        # the candidate generator ever changes)
        assert bo.best_value > lml_book - 0.05 * abs(lml_book), (
            acq,
            bo.best_value,
            lml_book,
        )

    # the search as a whole must beat the book hyperparameters
    assert max(results.values()) > lml_book, (results, lml_book)
