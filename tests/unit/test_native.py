"""C++ peak-store builder vs the numpy reference implementation."""

import numpy as np
import pytest

from alphadia_tpu.native import get_lib
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


@pytest.fixture(scope="module")
def spectra():
    s, *_ = make_synthetic_dia(
        SyntheticConfig(n_peptides=60, n_windows=4, n_cycles=50, noise_peaks_per_spectrum=40)
    )
    return s


def test_native_builds():
    assert get_lib() is not None, "g++ toolchain expected in this environment"


def _numpy_twin(d_native: DiaData, spectra) -> DiaData:
    """Rebuild the peak store with the numpy path on the same aligned subset."""
    d = DiaData(
        cycle=d_native.cycle,
        rt_values=d_native.rt_values,
        cycle_rt=d_native.cycle_rt,
        n_cycles=d_native.n_cycles,
        n_slots=d_native.n_slots,
        has_ms1=d_native.has_ms1,
        use_native=False,
    )
    sub = spectra.select(np.arange(d_native.n_cycles * d_native.n_slots))
    d._build_peak_store(sub)
    return d


def test_native_matches_numpy(spectra):
    if get_lib() is None:
        pytest.skip("no native lib")
    d_native = DiaData.from_spectra(spectra)
    d_np = _numpy_twin(d_native, spectra)

    np.testing.assert_array_equal(d_np.cell_start, d_native.cell_start)
    assert d_np.n_peaks == d_native.n_peaks
    assert d_np.n_stored_peaks == d_native.n_stored_peaks

    # within-cell entry ORDER may differ between the two builders (ghost
    # placement); the kernels are order-independent within a cell, so
    # compare cells as multisets
    flat = d_native.cell_start.reshape(-1, d_native.cell_start.shape[-1])
    rng = np.random.default_rng(0)
    checked = 0
    for row in rng.permutation(flat.shape[0]):
        a, z = flat[row, 0], flat[row, -1]
        if z <= a:
            continue
        pair_np = np.sort(d_np.peak_mz[a:z] + 1j * d_np.peak_intensity[a:z])
        pair_nat = np.sort(d_native.peak_mz[a:z] + 1j * d_native.peak_intensity[a:z])
        np.testing.assert_allclose(pair_np, pair_nat, rtol=1e-7)
        checked += 1
        if checked >= 200:
            break
    assert checked > 50
    # ghost counts match per store
    assert d_np.peak_is_ghost.sum() == d_native.peak_is_ghost.sum()


def test_native_matches_numpy_4d():
    """The 4D builder threads per-peak scan bins through the C++ scatter."""
    if get_lib() is None:
        pytest.skip("no native lib")
    s4, *_ = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=60, n_windows=4, n_cycles=50,
            noise_peaks_per_spectrum=40, with_mobility=True,
        )
    )
    d_native = DiaData.from_spectra(s4)
    assert d_native.use_native and d_native.has_mobility
    d_np = DiaData.from_spectra(s4, use_native=False)

    np.testing.assert_array_equal(d_np.cell_start, d_native.cell_start)
    assert d_np.n_stored_peaks == d_native.n_stored_peaks
    assert d_native.peak_scanbin.max() == d_np.peak_scanbin.max() > 0

    # per cell: the (mz, intensity, scanbin) multisets must agree
    flat = d_native.cell_start.reshape(-1, d_native.cell_start.shape[-1])
    rng = np.random.default_rng(1)
    checked = 0
    for row in rng.permutation(flat.shape[0]):
        a, z = flat[row, 0], flat[row, -1]
        if z <= a:
            continue
        def key(d):
            return np.lexsort(
                (d.peak_scanbin[a:z], d.peak_intensity[a:z], d.peak_mz[a:z])
            )
        kn, kp = key(d_native), key(d_np)
        np.testing.assert_allclose(
            d_native.peak_mz[a:z][kn], d_np.peak_mz[a:z][kp], rtol=1e-7
        )
        np.testing.assert_array_equal(
            d_native.peak_scanbin[a:z][kn], d_np.peak_scanbin[a:z][kp]
        )
        checked += 1
        if checked >= 200:
            break
    assert checked > 50
