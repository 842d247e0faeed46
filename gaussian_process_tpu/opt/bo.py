"""Bayesian-optimisation hyperparameter search with four acquisition functions.

Rebuild of the reference's BO pipelines — 1-D lengthscale search
[ref: tune_hyperparms_regression.py:165-289,316-395] and 11-D CO2 search
[ref: CO2_example.py:109-128,217-314,330-379] — with two deliberate fixes:

- All four acquisitions (PI / EI / UCB / TS) are actually dispatched. The
  reference's dispatchers always fall through to PI (quirk Q5: the 1-D
  version returns only PI's pick [ref: tune_hyperparms_regression.py:285-289];
  the CO2 version compares a *list* against strings — and misspells 'UBC' —
  so every branch is PI [ref: CO2_example.py:296-314,341]).
- Objective values are cached per point instead of recomputed for every
  training point each outer iteration [ref: tune_hyperparms_regression.py:355-357].

The surrogate-GP posterior over the candidate set is the jitted exact-GP
path (gp.regression); the outer proposal loop is host-side Python — it is
inherently sequential and tiny. Sharded multi-restart search lives in
parallel/restarts.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm as _norm

from gaussian_process_tpu.gp import regression as _reg
from gaussian_process_tpu.ops import kernels as _k

_STOP = None  # sentinel: acquisition requests early stop


def acquisition_pi(
    mean, std, best_y, *, improvement_margin: float = 5e-4, stop_threshold: float = 1e-3
):
    """Probability of Improvement. Early-stops when even the best candidate's
    improvement probability is negligible [ref: tune_hyperparms_regression.py:165-203,
    margin s=5e-4 at :178, stop at :183-188]."""
    z = (mean - (best_y + improvement_margin)) / std
    p = _norm.cdf(z)
    if float(jnp.max(p)) <= stop_threshold or float(jnp.sum(p)) <= stop_threshold:
        return _STOP
    return int(jnp.argmax(p))


def acquisition_ei(mean, std, best_y, *, improvement_margin: float = 5e-4):
    """Expected Improvement [ref: tune_hyperparms_regression.py:251-273]."""
    f_max = best_y + improvement_margin
    z = (mean - f_max) / std
    ei = (mean - f_max) * _norm.cdf(z) + std * _norm.pdf(z)
    return int(jnp.argmax(ei))


def acquisition_ucb(mean, std, *, kappa: float = 0.001):
    """Upper Confidence Bound [ref: tune_hyperparms_regression.py:206-229
    (kappa=0.001); CO2 variant uses kappa=7 [ref: CO2_example.py:228]]."""
    return int(jnp.argmax(mean + kappa * std))


def acquisition_ts(post_sample):
    """Thompson Sampling: argmax of one joint posterior draw
    [ref: tune_hyperparms_regression.py:232-248]."""
    return int(jnp.argmax(post_sample))


class BOResult(NamedTuple):
    best_params: np.ndarray  # (d,) argmax point
    best_value: float  # objective at best point
    points: np.ndarray  # (k, d) all evaluated points
    values: np.ndarray  # (k,) objective at each
    iterations: int
    stopped_early: bool


def _default_candidates(key, bounds, n, d):
    lo, hi = bounds
    u = jax.random.uniform(key, (n, d), dtype=jnp.result_type(np.asarray(lo), 1.0))
    return np.asarray(lo) + u * (np.asarray(hi) - np.asarray(lo))


def tune_bayesian_opt(
    objective: Callable[[np.ndarray], float],
    initial_points: np.ndarray,
    bounds: Tuple[np.ndarray, np.ndarray],
    *,
    n_iterations: int = 3,
    n_candidates: int = 100,
    acquisition: str = "PI",
    surrogate_kernel: Optional[_k.Kernel] = None,
    surrogate_params=None,
    surrogate_params_fn: Optional[Callable[[np.ndarray], _k.Params]] = None,
    surrogate_noise: float = 1e-4,
    ucb_kappa: float = 0.001,
    seed: int = 0,
) -> BOResult:
    """Maximise a black-box ``objective`` (e.g. the LML as a function of a
    hyperparameter vector) over a box.

    ``surrogate_params_fn``: optional map from the current training points to
    surrogate kernel params — the CO2 pipeline keys its composite surrogate on
    the first training point [ref: CO2_example.py:162]; default is a unit RBF
    [ref: tune_hyperparms_regression.py:81-83].
    """
    key = jax.random.key(seed)
    pts = np.atleast_2d(np.asarray(initial_points, dtype=np.float64))
    d = pts.shape[1]
    vals = np.array([float(objective(p)) for p in pts])

    if surrogate_kernel is None:
        surrogate_kernel = _k.RBF()
        surrogate_params = surrogate_kernel.init_params()

    posterior_jit = jax.jit(
        lambda sp, xt, yt, xs: _reg.posterior(
            surrogate_kernel, sp, xt, yt, xs, noise_variance=surrogate_noise
        )
    )

    stopped = False
    it = 0
    last_pick: Optional[np.ndarray] = None
    for it in range(1, n_iterations + 1):
        key, ck, tk = jax.random.split(key, 3)
        cands = _default_candidates(ck, bounds, n_candidates, d)

        sp = surrogate_params_fn(pts) if surrogate_params_fn else surrogate_params
        post = posterior_jit(sp, jnp.asarray(pts), jnp.asarray(vals), jnp.asarray(cands))
        std = jnp.maximum(post.std, 1e-12)
        best_y = float(np.max(vals))

        if acquisition == "PI":
            idx = acquisition_pi(post.mean, std, best_y)
        elif acquisition == "EI":
            idx = acquisition_ei(post.mean, std, best_y)
        elif acquisition == "UCB":
            idx = acquisition_ucb(post.mean, std, kappa=ucb_kappa)
        elif acquisition == "TS":
            sample = _reg.sample_posterior(
                surrogate_kernel, sp, post, jnp.asarray(cands), tk, num_functions=1
            )[:, 0]
            idx = acquisition_ts(sample)
        else:
            raise ValueError(f"unknown acquisition {acquisition!r}")

        if idx is _STOP:
            stopped = True
            break
        pick = cands[idx]
        # UCB's stop rule: proposing the same point twice ends the search
        # [ref: tune_hyperparms_regression.py:224-226]
        if last_pick is not None and np.allclose(pick, last_pick):
            stopped = True
            break
        last_pick = pick
        pts = np.vstack([pts, pick])
        vals = np.append(vals, float(objective(pick)))

    best = int(np.argmax(vals))
    return BOResult(
        best_params=pts[best],
        best_value=float(vals[best]),
        points=pts,
        values=vals,
        iterations=it,
        stopped_early=stopped,
    )
