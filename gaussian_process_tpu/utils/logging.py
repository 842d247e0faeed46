"""Structured, rank-tagged JSONL logging.

The reference's only observability is ``print`` statements — per-iteration
Newton error [ref: GP_binary_classification.py:117-121,
GP_multi_classification.py:162-166], BO progress
[ref: tune_hyperparms_regression.py:377-389, CO2_example.py:361-371] — plus
``np.savetxt`` matrix dumps [ref: GP_multi_classification.py:11-23].

Here those become structured records: every event is one JSON line tagged with
wall-time, process index, and a logical name, so multi-host runs interleave
cleanly and convergence curves (Newton error decay, BO best-so-far) are
machine-readable artifacts instead of matplotlib windows.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Any, Dict, Optional


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class JsonlLogger:
    """Append-only JSONL event logger.

    ``path=None`` logs to stderr. Each record:
    ``{"ts": ..., "rank": ..., "event": ..., **fields}``.
    """

    def __init__(self, path: Optional[str] = None, *, name: str = "gp"):
        self.name = name
        self.rank = _process_index()
        self._own_file = path is not None
        if path is None:
            self._fh: IO[str] = sys.stderr
        else:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            # one file per process: multi-host runs never contend on a write
            if self.rank > 0:
                base, ext = os.path.splitext(path)
                path = f"{base}.rank{self.rank}{ext}"
            self._fh = open(path, "a", buffering=1)
        self.path = path

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        record = {
            "ts": round(time.time(), 6),
            "rank": self.rank,
            "logger": self.name,
            "event": event,
        }
        for k, v in fields.items():
            record[k] = _jsonable(v)
        self._fh.write(json.dumps(record) + "\n")
        return record

    # Convergence-record conveniences mirroring the reference's prints.
    def newton_step(self, iteration: int, error: float, **extra: Any) -> None:
        """[ref: GP_binary_classification.py:117 'iteration %d, error: %f']"""
        self.log("newton_step", iteration=iteration, error=error, **extra)

    def bo_step(self, iteration: int, best_lml: float, candidate, **extra: Any) -> None:
        """[ref: tune_hyperparms_regression.py:377-389 per-iter BO prints]"""
        self.log("bo_step", iteration=iteration, best_lml=best_lml, candidate=candidate, **extra)

    def close(self) -> None:
        if self._own_file:
            self._fh.close()

    def __enter__(self) -> "JsonlLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _jsonable(v: Any) -> Any:
    """Coerce numpy/JAX scalars and arrays to JSON-native types."""
    import numpy as np

    if hasattr(v, "tolist"):  # ndarray / jax.Array / np scalar
        out = v.tolist() if getattr(v, "ndim", 1) else v.item()
        return out
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


def read_jsonl(path: str):
    """Load a JSONL log back as a list of dicts (for tests / analysis)."""
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]
