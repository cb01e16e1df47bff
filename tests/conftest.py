"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Unit tests never require real TPU hardware; multi-chip sharding is validated
on forced host devices (the driver separately dry-runs `dryrun_multichip`).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def tmp_out(tmp_path):
    return tmp_path
