"""Test-session configuration.

Forces JAX onto a simulated 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (mirrors the multi-device test capability the
reference never needed; see SURVEY.md §4).

Must run before the first `import jax` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may force-register a TPU platform and
# override JAX_PLATFORMS via jax.config; pin it back to CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
