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

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm as _norm

from gaussian_process_tpu import config as _config
from gaussian_process_tpu.gp import regression as _reg
from gaussian_process_tpu.linalg import cholesky as _chol_mod
from gaussian_process_tpu.ops import kernels as _k

_STOP = None  # sentinel: acquisition requests early stop


def _argmax_valid(score: jnp.ndarray, mask) -> int:
    """argmax over candidates, restricted to ``mask`` (True = scoreable)."""
    if mask is not None:
        score = jnp.where(jnp.asarray(mask), score, -jnp.inf)
    return int(jnp.argmax(score))


def acquisition_pi(
    mean,
    std,
    best_y,
    *,
    improvement_margin: float = 5e-4,
    stop_threshold: float = 1e-3,
    mask=None,
):
    """Probability of Improvement. Early-stops when even the best candidate's
    improvement probability is negligible [ref: tune_hyperparms_regression.py:165-203,
    margin s=5e-4 at :178, stop at :183-188]."""
    z = (mean - (best_y + improvement_margin)) / std
    p = _norm.cdf(z)
    if mask is not None:
        p = jnp.where(jnp.asarray(mask), p, 0.0)
    if float(jnp.max(p)) <= stop_threshold or float(jnp.sum(p)) <= stop_threshold:
        return _STOP
    return int(jnp.argmax(p))


def acquisition_ei(mean, std, best_y, *, improvement_margin: float = 5e-4, mask=None):
    """Expected Improvement [ref: tune_hyperparms_regression.py:251-273]."""
    f_max = best_y + improvement_margin
    z = (mean - f_max) / std
    ei = (mean - f_max) * _norm.cdf(z) + std * _norm.pdf(z)
    return _argmax_valid(ei, mask)


def acquisition_ucb(mean, std, *, kappa: float = 0.001, mask=None):
    """Upper Confidence Bound [ref: tune_hyperparms_regression.py:206-229
    (kappa=0.001); CO2 variant uses kappa=7 [ref: CO2_example.py:228]]."""
    return _argmax_valid(mean + kappa * std, mask)


def acquisition_ts(post_sample, *, mask=None):
    """Thompson Sampling: argmax of one joint posterior draw
    [ref: tune_hyperparms_regression.py:232-248]."""
    return _argmax_valid(post_sample, mask)


class BOResult(NamedTuple):
    best_params: np.ndarray  # (d,) argmax point
    best_value: float  # objective at best point
    points: np.ndarray  # (k, d) all evaluated points
    values: np.ndarray  # (k,) objective at each
    iterations: int
    stopped_early: bool


# Minimum padded capacity of the surrogate's training set. The evaluated-point
# array is padded to the next power of two >= k, so the jitted surrogate
# retraces only when a capacity bucket is crossed (log2 of the search length
# compiles total) instead of once per iteration — the reference's 11-D CO2
# search scores 500 candidates x 10 iterations x 4 acquisitions against a
# surrogate whose training set grows by one point per step
# [ref: CO2_example.py:330-379]; a per-step retrace would dominate wall-clock.
BO_PAD_MIN = 8


def _padded_capacity(k: int) -> int:
    return max(BO_PAD_MIN, 1 << max(0, (k - 1).bit_length()))


@functools.partial(jax.jit, static_argnames=("kernel", "noise_variance"))
def _surrogate_posterior_padded(
    kernel: _k.Kernel,
    sp,
    x_pad: jnp.ndarray,
    y_pad: jnp.ndarray,
    n_valid: jnp.ndarray,
    x_cand: jnp.ndarray,
    noise_variance: float,
) -> _reg.Posterior:
    """Exact surrogate-GP posterior on a padded training set.

    Rows >= ``n_valid`` of ``x_pad``/``y_pad`` are padding. Their kernel
    rows/columns are masked to the identity (K[pad, pad] = I, cross terms 0)
    and their targets/cross-covariances to zero, so the factorization is
    block-diagonal chol(K_valid) (+) I and the padded posterior mean/var/LML
    equal the unpadded ones exactly — while the program shape stays fixed
    across iterations (one XLA compile per capacity bucket).
    """
    cap = x_pad.shape[0]
    valid = jnp.arange(cap) < n_valid
    vv = valid[:, None] & valid[None, :]
    K = jnp.where(vv, _k.gram(kernel, sp, x_pad), 0.0)
    K = K + jnp.diag(jnp.where(valid, jnp.asarray(noise_variance, K.dtype), 1.0))
    K_s = jnp.where(valid[:, None], _k.gram(kernel, sp, x_pad, x_cand), 0.0)
    kss_diag = _k.gram_diag(kernel, sp, x_cand)
    y = jnp.where(valid, y_pad, 0.0)

    res = _chol_mod.safe_cholesky(K)
    L = res.factor
    z_all = _chol_mod.tri_solve(L, jnp.concatenate([y[:, None], K_s], axis=1))
    z_y = z_all[:, 0]
    v = z_all[:, 1:]
    alpha = _chol_mod.tri_solve(L, z_y, trans=True)
    mean = jnp.dot(v.T, z_y, preferred_element_type=K.dtype)
    var = jnp.maximum(kss_diag - jnp.sum(v * v, axis=0), 0.0)
    # padded diag(L) entries are exactly 1 -> their logs vanish from the sum
    lml = (
        -0.5 * jnp.dot(z_y, z_y)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * n_valid.astype(K.dtype) * jnp.asarray(np.log(2.0 * np.pi), K.dtype)
    )
    return _reg.Posterior(
        mean=mean,
        var=var,
        std=jnp.sqrt(var),
        lml=lml,
        chol=L,
        alpha=alpha,
        v=v,
        jitter=res.jitter,
    )


def _default_candidates(key, bounds, n, d):
    lo, hi = bounds
    u = jax.random.uniform(key, (n, d), dtype=jnp.result_type(np.asarray(lo), 1.0))
    return np.asarray(lo) + u * (np.asarray(hi) - np.asarray(lo))


def fresh_mask(
    cands: np.ndarray, pts: np.ndarray, *, rel_tol: float = 1e-6
) -> np.ndarray:
    """Boolean mask of proposals that do NOT coincide with evaluated points.

    The reference dedups BO proposals against the evaluated set before
    scoring them (``overlap`` [ref: tune_hyperparms_regression.py:316-329],
    regenerating via ``random_gen_test_parms`` [ref: :331-346]); without
    this the search can burn iterations re-evaluating (or proposing
    epsilon-duplicates of) known points. Returned as a mask (not a filtered
    array) so the scored candidate batch keeps a fixed shape and the jitted
    surrogate's compile cache stays warm.
    """
    if len(pts) == 0 or len(cands) == 0:
        return np.ones(len(cands), dtype=bool)
    diff = np.abs(cands[:, None, :] - pts[None, :, :])  # (c, k, d)
    scale = np.maximum(np.abs(pts), 1.0)[None, :, :]
    dup = (diff <= rel_tol * scale).all(axis=-1).any(axis=-1)
    return ~dup


def dedup_candidates(
    cands: np.ndarray, pts: np.ndarray, *, rel_tol: float = 1e-6
) -> np.ndarray:
    """Drop proposals that coincide with already-evaluated points
    (filtering wrapper over :func:`fresh_mask`)."""
    return cands[fresh_mask(cands, pts, rel_tol=rel_tol)]


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

    def surrogate_posterior(sp, pts, vals, cands):
        # pad the evaluated set to a power-of-two capacity so the jitted
        # surrogate hits its compile cache across iterations (shape changes
        # only at bucket boundaries); padding rows repeat pts[0] (finite,
        # masked out inside)
        k = len(pts)
        cap = _padded_capacity(k)
        x_pad = np.repeat(pts[:1], cap, axis=0)
        x_pad[:k] = pts
        y_pad = np.zeros(cap)
        y_pad[:k] = vals
        return _surrogate_posterior_padded(
            surrogate_kernel,
            sp,
            jnp.asarray(x_pad),
            jnp.asarray(y_pad),
            jnp.asarray(k, jnp.int32),
            jnp.asarray(cands),
            float(surrogate_noise),
        )

    stopped = False
    it = start_iter
    last_pick: Optional[np.ndarray] = None
    for it in range(start_iter + 1, n_iterations + 1):
        # fixed-size candidate batch; duplicates of evaluated points are
        # masked out of the acquisition argmax rather than dropped (dropping
        # would change the scored shape and force a retrace per iteration)
        fresh = np.zeros(0, dtype=bool)
        cands = np.zeros((0, d))
        for _attempt in range(4):  # regenerate until fresh points appear
            key, ck = jax.random.split(key)
            cands = _default_candidates(ck, bounds, n_candidates, d)
            fresh = fresh_mask(cands, pts)
            if fresh.any():
                break
        if not fresh.any():  # box exhausted (tiny/discrete search spaces)
            stopped = True
            break
        key, tk = jax.random.split(key)

        sp = surrogate_params_fn(pts) if surrogate_params_fn else surrogate_params
        post = surrogate_posterior(sp, pts, vals, cands)
        std = jnp.maximum(post.std, 1e-12)
        best_y = float(np.max(vals))

        if acquisition == "PI":
            idx = acquisition_pi(post.mean, std, best_y, mask=fresh)
        elif acquisition == "EI":
            idx = acquisition_ei(post.mean, std, best_y, mask=fresh)
        elif acquisition == "UCB":
            idx = acquisition_ucb(post.mean, std, kappa=ucb_kappa, mask=fresh)
        elif acquisition == "TS":
            sample = _reg.sample_posterior(
                surrogate_kernel, sp, post, jnp.asarray(cands), tk, num_functions=1
            )[:, 0]
            idx = acquisition_ts(sample, mask=fresh)
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
