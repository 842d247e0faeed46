"""Dataset generation/loading — the reference's datasets with fixed seeds.

[ref: GP_regression.py:53-68 (sine+noise), GP_binary_classification.py:13-32
(moons/circles/linsep), GP_multi_classification.py:200-211 (3 blobs),
CO2_example.py:405-412 (Mauna Loa via the long-dead fetch_mldata — quirk Q7)].

The Mauna Loa series ships vendored as CSV (this build environment has zero
egress and ``fetch_mldata`` has been gone since sklearn 0.20). The vendored
series is reconstructed from the *real public-domain NOAA GML record* —
transcribed annual means 1959-2001 + the observed 1958 monthly values + the
mean seasonal cycle; ~+-0.3 ppm of the true monthly record, exact in trend.
See ``gaussian_process_tpu/data/make_mauna_loa.py`` for full provenance and
the deterministic generator. Columns and mean-centering convention match the
reference's usage [ref: CO2_example.py:405-412].
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")

NOISE_VARIANCE = 5e-4  # [ref: GP_regression.py:58]


def sine_regression(
    n_train: int = 5, n_test: int = 100, *, seed: int = 0, noise: float = NOISE_VARIANCE
):
    """f(x) = sin(0.9 x) on [-5, 5] with Gaussian observation noise.

    [ref: GP_regression.py:53-68 (dataset_generator); N=5, n=100 at :301-302]
    Returns (true_fn, x_train (N,1), y_train (N,), x_test (n,1)).
    """
    rng = np.random.default_rng(seed)
    f = lambda x: np.sin(0.9 * np.asarray(x)).reshape(np.shape(x)[0], -1)[:, 0]
    x_train = rng.uniform(-5, 5, size=(n_train, 1))
    y_train = f(x_train) + np.sqrt(noise) * rng.standard_normal(n_train)
    x_test = np.linspace(-5, 5, n_test).reshape(-1, 1)
    return f, x_train, y_train, x_test


def moons_binary(*, noise: float = 0.3, test_size: float = 0.4, seed: int = 0):
    """Two-moons with {-1,+1} labels, standardised, 60/40 split.

    [ref: GP_binary_classification.py:13-32,160-161 (make_moons(noise=.3,
    random_state=0), StandardScaler, train_test_split random_state=42)]
    """
    from sklearn.datasets import make_moons
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    X, y = make_moons(noise=noise, random_state=seed)
    y = np.where(y == 0, -1, 1)
    X = StandardScaler().fit_transform(X)
    return train_test_split(X, y, test_size=test_size, random_state=42)


def binary_dataset(kind: str = "moons", *, test_size: float = 0.4, seed: int = 0):
    """The reference's three binary datasets: moons / circles / linsep.

    [ref: GP_binary_classification.py:13-32 (make_moons(noise=.3),
    make_circles(noise=.2, factor=.5), linearly-separable via
    make_classification + uniform jitter); labels mapped to {-1,+1},
    standardised, 60/40 split]
    """
    from sklearn.datasets import make_circles, make_classification, make_moons
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    if kind == "moons":
        X, y = make_moons(noise=0.3, random_state=seed)
    elif kind == "circles":
        X, y = make_circles(noise=0.2, factor=0.5, random_state=1)
    elif kind == "linsep":
        X, y = make_classification(
            n_features=2, n_redundant=0, n_informative=2,
            random_state=1, n_clusters_per_class=1,
        )
        X += 2 * np.random.default_rng(2).uniform(size=X.shape)
    else:
        raise ValueError(f"unknown binary dataset {kind!r}")
    y = np.where(y == 0, -1, 1)
    X = StandardScaler().fit_transform(X)
    return train_test_split(X, y, test_size=test_size, random_state=42)


def blobs_multiclass(
    *, centers: int = 3, n_samples: int = 100, test_size: float = 0.4, seed: int = 7
):
    """Gaussian blobs, C classes, 60/40 split.

    [ref: GP_multi_classification.py:200-211 (make_blobs(centers=3)),
    :221-222 (train_test_split random_state=42)]
    """
    from sklearn.datasets import make_blobs
    from sklearn.model_selection import train_test_split

    X, y = make_blobs(n_features=2, centers=centers, n_samples=n_samples, random_state=seed)
    return train_test_split(X, y, test_size=test_size, random_state=42)


def mauna_loa(*, center: bool = True):
    """(x_train (n,1) year, y_train (n,) CO2 ppm [mean-centered], mean).

    [ref: CO2_example.py:405-412: X = data[:, [1]] (time), y = data[:, 0],
    y mean-centered]
    """
    path = os.path.join(_DATA_DIR, "mauna_loa_co2.csv")
    data = np.loadtxt(path, delimiter=",", skiprows=1)
    x = data[:, [0]]
    y = data[:, 1]
    mean = float(y.mean())
    if center:
        y = y - mean
    return x, y, mean


def mauna_loa_test_grid(x_train: np.ndarray, years: int = 20) -> np.ndarray:
    """Monthly extrapolation grid for ``years`` past the last training year.

    [ref: CO2_example.py:408 (np.arange(max//1+1, max//1+21, 1/12))]
    """
    start = np.floor(x_train.max()) + 1
    return np.arange(start, start + years, 1.0 / 12.0)[:, None]


def large_scale_regression(n: int, d: int = 8, *, seed: int = 0, noise: float = 1e-2):
    """Synthetic large-n regression for the scaling benchmarks (no reference
    equivalent; BASELINE.md scaling targets)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-5, 5, size=(n, d)).astype(np.float32)
    w = rng.standard_normal(d).astype(np.float32)
    y = np.sin(x @ w) + np.sqrt(noise) * rng.standard_normal(n).astype(np.float32)
    return x, y.astype(np.float32)
