"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Unit tests never require real TPU hardware; multi-chip sharding is validated
on forced host devices (the driver separately dry-runs `dryrun_multichip`).
"""

import os

# The environment pins JAX_PLATFORMS=axon (single TPU via a remote-compile
# tunnel; ~40 s per jit compile, one client at a time). Tests must force CPU.
# The axon sitecustomize's register() overrides the env var programmatically,
# so the only reliable switch is jax.config BEFORE any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

# the suite must run in a fresh checkout without `pip install -e .` AND must
# always test THIS checkout: prepend the repo root unconditionally so a stale
# pip-installed alphadia_tpu can never shadow HEAD (advisor r4)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def tmp_out(tmp_path):
    return tmp_path
