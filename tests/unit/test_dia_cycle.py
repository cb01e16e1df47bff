import numpy as np
import pytest

from alphadia_tpu.exceptions import NotDiaDataError
from alphadia_tpu.rawdata.dia_cycle import (
    _normed_autocorrelation,
    determine_dia_cycle,
)


def _signature(n_cycles, cycle, prefix=0):
    lower = np.tile(cycle[:, 0], n_cycles)
    upper = np.tile(cycle[:, 1], n_cycles)
    if prefix:
        lower = np.concatenate([np.full(prefix, 100.0), lower])
        upper = np.concatenate([np.full(prefix, 150.0), upper])
    rt = np.arange(len(lower), dtype=np.float32)
    return rt, lower.astype(np.float32), upper.astype(np.float32)


def _make_cycle(n_windows):
    edges = np.linspace(400, 1000, n_windows + 1)
    cyc = np.stack([np.r_[-1.0, edges[:-1]], np.r_[-1.0, edges[1:]]], axis=1)
    return cyc


def test_autocorrelation_periodicity():
    x = np.tile(np.arange(7, dtype=float), 50)
    corr = _normed_autocorrelation(x)
    assert corr[0] == pytest.approx(1.0)
    assert corr[7] > corr[3]
    # cross check against direct O(n^2) definition
    xm = x - x.mean()
    direct = np.correlate(xm, xm, "full")[len(xm) - 1 :]
    np.testing.assert_allclose(corr, direct / direct[0], atol=1e-9)


def test_cycle_detection_simple():
    cyc = _make_cycle(10)
    rt, lo, hi = _signature(40, cyc)
    cycle, start, length = determine_dia_cycle(rt, lo, hi)
    assert length == 11
    assert start == 0
    assert cycle.shape == (1, 11, 1, 2)
    np.testing.assert_allclose(cycle[0, :, 0, 0], cyc[:, 0])


def test_cycle_detection_with_prefix():
    cyc = _make_cycle(8)
    rt, lo, hi = _signature(30, cyc, prefix=5)
    cycle, start, length = determine_dia_cycle(rt, lo, hi)
    assert length == 9
    assert start == 5


def test_invalid_cycle_raises():
    rng = np.random.default_rng(1)
    lo = rng.uniform(400, 900, 500).astype(np.float32)
    hi = lo + 20
    rt = np.arange(500, dtype=np.float32)
    with pytest.raises(NotDiaDataError):
        determine_dia_cycle(rt, lo, hi)
