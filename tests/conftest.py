"""Test harness configuration.

Runs everything on CPU with an emulated 8-device mesh
(``--xla_force_host_platform_device_count=8``) and float64 enabled, so:
- parity tests compare against float64 NumPy oracles transliterated from the
  reference scripts (SURVEY.md sec. 4, strategy item 3);
- distributed tests exercise real shardings/collectives without TPU hardware
  (SURVEY.md sec. 4, strategy item 4).

Must run before ``import jax`` anywhere in the test process.
"""

import os

# NOTE: in this image a sitecustomize preimports jax with JAX_PLATFORMS=axon
# (real-TPU tunnel), so plain env vars are too late — the platform must be
# overridden through jax.config after import. XLA_FLAGS is still read lazily
# at CPU-backend init, so setting it here works as long as no backend has
# been touched yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
