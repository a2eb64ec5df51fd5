"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding (data/bank axes) is validated on emulated CPU devices
(SURVEY.md §4), mirroring how the driver dry-runs `dryrun_multichip`.
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
