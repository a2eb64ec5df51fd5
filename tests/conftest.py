"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding (data/bank axes) is validated on emulated CPU devices
(SURVEY.md §4), mirroring how the driver dry-runs `dryrun_multichip`.

The axon TPU plugin's sitecustomize sets jax_platforms via config.update,
which outranks the JAX_PLATFORMS env var — so we must config.update back to
CPU here, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Bound the number of live XLA:CPU executables across the (250-test,
    compile-heavy) suite: with everything cached, the full run segfaults
    inside LLVM during a late compile (reproduced twice at the same test;
    either half of the suite alone is green). Dropping caches at module
    boundaries keeps the process comfortably under the trigger."""
    yield
    jax.clear_caches()
