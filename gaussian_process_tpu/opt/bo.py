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

from gaussian_process_tpu import config as _config
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


def dedup_candidates(
    cands: np.ndarray, pts: np.ndarray, *, rel_tol: float = 1e-6
) -> np.ndarray:
    """Drop proposals that coincide with already-evaluated points.

    The reference dedups BO proposals against the evaluated set before
    scoring them (``overlap`` [ref: tune_hyperparms_regression.py:316-329],
    regenerating via ``random_gen_test_parms`` [ref: :331-346]); without
    this the search can burn iterations re-evaluating (or proposing
    epsilon-duplicates of) known points.
    """
    if len(pts) == 0 or len(cands) == 0:
        return cands
    diff = np.abs(cands[:, None, :] - pts[None, :, :])  # (c, k, d)
    scale = np.maximum(np.abs(pts), 1.0)[None, :, :]
    dup = (diff <= rel_tol * scale).all(axis=-1).any(axis=-1)
    return cands[~dup]


def tune_bayesian_opt(
    objective: Callable[[np.ndarray], float],
    initial_points: np.ndarray,
    bounds: Tuple[np.ndarray, np.ndarray],
    *,
    n_iterations: Optional[int] = None,
    n_candidates: Optional[int] = None,
    acquisition: Optional[str] = None,
    surrogate_kernel: Optional[_k.Kernel] = None,
    surrogate_params=None,
    surrogate_params_fn: Optional[Callable[[np.ndarray], _k.Params]] = None,
    surrogate_noise: Optional[float] = None,
    ucb_kappa: Optional[float] = None,
    seed: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    cfg: Optional[_config.BOConfig] = None,
) -> BOResult:
    """Maximise a black-box ``objective`` (e.g. the LML as a function of a
    hyperparameter vector) over a box.

    ``surrogate_params_fn``: optional map from the current training points to
    surrogate kernel params — the CO2 pipeline keys its composite surrogate on
    the first training point [ref: CO2_example.py:162]; default is a unit RBF
    [ref: tune_hyperparms_regression.py:81-83].

    Proposals are deduplicated against every point already evaluated
    (:func:`dedup_candidates`), so an objective value is computed at most
    once per point.

    ``checkpoint_dir``: persist (points, values, RNG key) after every
    objective evaluation via :mod:`utils.checkpoint`; with ``resume`` a
    killed search continues from the last completed iteration instead of
    re-evaluating the (expensive) objective history.
    """
    from gaussian_process_tpu.utils import checkpoint as _ckpt

    base = _config.DEFAULT_BO if cfg is None else cfg
    if n_iterations is None:
        n_iterations = base.n_iterations
    if n_candidates is None:
        n_candidates = base.n_candidates
    if acquisition is None:
        acquisition = base.acquisition
    if surrogate_noise is None:
        surrogate_noise = base.surrogate_noise
    if ucb_kappa is None:
        ucb_kappa = base.ucb_kappa
    if seed is None:
        seed = base.seed

    key = jax.random.key(seed)
    pts = np.atleast_2d(np.asarray(initial_points, dtype=np.float64))
    d = pts.shape[1]
    start_iter = 0
    if checkpoint_dir is not None and resume:
        step = _ckpt.latest_step(checkpoint_dir)
        if step is not None:
            like = {
                "points": np.zeros((0, d)),
                "values": np.zeros((0,)),
                "key": jax.random.key_data(key),
            }
            state = _ckpt.restore(checkpoint_dir, like, step=step)
            pts = np.atleast_2d(state["points"])
            vals = np.asarray(state["values"])
            key = jax.random.wrap_key_data(state["key"])
            start_iter = step
    if start_iter == 0:
        vals = np.array([float(objective(p)) for p in pts])
        if checkpoint_dir is not None:
            _ckpt.save(
                checkpoint_dir,
                {"points": pts, "values": vals, "key": jax.random.key_data(key)},
                step=0,
            )

    if surrogate_kernel is None:
        surrogate_kernel = _k.RBF()
        surrogate_params = surrogate_kernel.init_params()

    posterior_jit = jax.jit(
        lambda sp, xt, yt, xs: _reg.posterior(
            surrogate_kernel, sp, xt, yt, xs, noise_variance=surrogate_noise
        )
    )

    stopped = False
    it = start_iter
    last_pick: Optional[np.ndarray] = None
    for it in range(start_iter + 1, n_iterations + 1):
        cands = np.zeros((0, d))
        for _attempt in range(4):  # regenerate until fresh points appear
            key, ck = jax.random.split(key)
            cands = dedup_candidates(
                _default_candidates(ck, bounds, n_candidates, d), pts
            )
            if len(cands):
                break
        if len(cands) == 0:  # box exhausted (tiny/discrete search spaces)
            stopped = True
            break
        key, tk = jax.random.split(key)

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
        if checkpoint_dir is not None:
            _ckpt.save(
                checkpoint_dir,
                {"points": pts, "values": vals, "key": jax.random.key_data(key)},
                step=it,
            )

    best = int(np.argmax(vals))
    return BOResult(
        best_params=pts[best],
        best_value=float(vals[best]),
        points=pts,
        values=vals,
        iterations=it,
        stopped_early=stopped,
    )
