"""Reference-parity tests run only where a reference checkout exists.

These tests execute the reference implementation's own functions (numba
pure-Python mode via tests/parity/_refload.py) as oracles against this
engine's numerics. On machines without the reference checkout the whole
directory skips.
"""

from pathlib import Path

import pytest

REFERENCE_ROOT = Path("/root/reference")


def pytest_collection_modifyitems(config, items):
    if REFERENCE_ROOT.exists():
        return
    skip = pytest.mark.skip(reason="reference checkout not present at /root/reference")
    for item in items:
        item.add_marker(skip)
