"""Test harness config: hermetic CPU backend with an 8-device virtual mesh.

Mirrors the reference's split between hermetic host-side tests and
device-only tests (SURVEY.md §4): everything here runs on CPU — Pallas
kernels in interpreter mode, sharding over 8 virtual CPU devices
(``xla_force_host_platform_device_count``). Device (real-TPU) validation is
done by ``bench.py`` / the driver, not pytest.
"""

import os

# Must run before any jax backend initialization (conftest is imported
# before test modules). NOTE: the env var JAX_PLATFORMS alone is NOT enough
# in this image — a sitecustomize force-registers the TPU plugin — so we also
# override via jax.config, which wins at backend-selection time.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
