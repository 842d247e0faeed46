"""Failure detection and elastic re-dispatch for sharded restarts.

The reference's only "recovery" mechanism is dataset caching to .npy
[ref: GP_multi_classification.py:215-220]. Here the unit of recovery is the
hyperparameter-search *candidate*: every LML / gradient-restart evaluation is
stateless (SURVEY.md C16), so a lost shard — a dead host, a preempted chip,
or a numerically failed factorization — is simply re-dispatched.

Detection layers (SURVEY.md §5, failure-detection row):
- *in-program*: a failed factorization surfaces as non-finite LML (the NaN
  guard in ``linalg.safe_cholesky`` caps jitter escalation; past the cap the
  result is NaN, never silently wrong);
- *host-level*: a raised exception from the sharded evaluation (device loss,
  DCN disconnect) marks the whole attempt's candidates as lost;
- *cross-host*: ``multihost.sync_hosts`` raises on every survivor when a
  process dies, at which point the driver re-enters here with the surviving
  mesh.

Re-dispatch is at-least-once: candidates are pure functions of their
parameters, so re-evaluation is idempotent.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import numpy as np


class RedispatchResult(NamedTuple):
    values: np.ndarray  # (batch,) evaluation results, NaN where unrecovered
    ok: np.ndarray  # (batch,) bool: candidate produced a finite result
    attempts: int  # dispatch rounds used
    redispatched: int  # total candidate re-evaluations performed


def _take(batch, idx: np.ndarray):
    return jax.tree_util.tree_map(lambda leaf: np.asarray(leaf)[idx], batch)


def _pad_to(batch, size: int):
    """Tile candidates up to ``size`` (sharded evals need full batches);
    padding rows are duplicates whose results are discarded."""
    n = int(jax.tree_util.tree_leaves(batch)[0].shape[0])
    reps = -(-size // n)
    return jax.tree_util.tree_map(
        lambda leaf: np.tile(
            np.asarray(leaf), (reps,) + (1,) * (np.asarray(leaf).ndim - 1)
        )[:size],
        batch,
    )


def run_with_redispatch(
    eval_batch: Callable,
    candidates,
    *,
    batch_granularity: int = 1,
    max_attempts: int = 3,
    inject_failure: Optional[Callable[[int, np.ndarray], np.ndarray]] = None,
    logger: Optional[Callable[[str], None]] = None,
) -> RedispatchResult:
    """Evaluate every candidate, re-dispatching lost/failed ones.

    ``eval_batch(params_batch) -> (batch,) array`` — typically a
    ``make_sharded_lml`` closure; its batch size must be a multiple of
    ``batch_granularity`` (the mesh restart-axis size). ``inject_failure``
    is the fault-injection hook for tests: it receives (attempt, values)
    and may corrupt them to simulate lost shards.
    """
    log = logger or (lambda msg: None)
    n = int(jax.tree_util.tree_leaves(candidates)[0].shape[0])
    values = np.full(n, np.nan, dtype=np.float64)
    pending = np.arange(n)
    attempts = 0
    redispatched = 0

    while pending.size and attempts < max_attempts:
        attempts += 1
        if attempts > 1:
            redispatched += int(pending.size)
        size = max(
            batch_granularity,
            -(-pending.size // batch_granularity) * batch_granularity,
        )
        batch = _pad_to(_take(candidates, pending), size)
        try:
            out = np.asarray(jax.device_get(eval_batch(batch)), dtype=np.float64)
        except Exception as exc:  # device loss / DCN failure: whole attempt lost
            log(f"redispatch attempt {attempts}: evaluation raised {exc!r}")
            continue
        if inject_failure is not None:
            out = inject_failure(attempts, out)
        out = out[: pending.size]
        finite = np.isfinite(out)
        values[pending[finite]] = out[finite]
        failed = pending[~finite]
        if failed.size:
            log(
                f"redispatch attempt {attempts}: {failed.size}/{pending.size} "
                f"candidates lost, requeueing"
            )
        pending = failed

    ok = np.isfinite(values)
    return RedispatchResult(
        values=values, ok=ok, attempts=attempts, redispatched=redispatched
    )
