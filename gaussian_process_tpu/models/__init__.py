"""High-level estimator facade (sklearn-style fit/predict) over the
functional core.

The reference exposes its five workloads as bare scripts with module-level
state [ref: GP_regression.py:300-315, GP_binary_classification.py:157-250,
GP_multi_classification.py:214-253]; these classes are the object-level API a
user migrating from them reaches for. Each is a thin stateful shell: all math
stays in the pure jittable functions of ``gp``/``opt``, so everything here
jit-compiles once per (kernel, shapes) and re-runs cheaply.
"""

from gaussian_process_tpu.models.estimators import (
    GPRegressor,
    GPBinaryClassifier,
    GPMulticlassClassifier,
)

__all__ = ["GPRegressor", "GPBinaryClassifier", "GPMulticlassClassifier"]
