"""Auxiliary subsystems: datasets, logging, checkpointing, profiling, plotting.

(SURVEY.md §5 — the reference has essentially none of these; the closest
analogs are print statements, plt.show windows, and .npy dataset caching.)
"""

from gaussian_process_tpu.utils import checkpoint  # noqa: F401
from gaussian_process_tpu.utils import datasets  # noqa: F401
from gaussian_process_tpu.utils import logging  # noqa: F401
from gaussian_process_tpu.utils import plotting  # noqa: F401
from gaussian_process_tpu.utils import profiling  # noqa: F401
from gaussian_process_tpu.utils.logging import JsonlLogger, read_jsonl  # noqa: F401
from gaussian_process_tpu.utils.profiling import Stopwatch, time_fn  # noqa: F401
