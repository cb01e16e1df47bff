"""Pallas XIC kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

from alphadia_tpu.ops.xic import extract_xic
from alphadia_tpu.ops.xic_pallas import extract_xic_pallas
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


@pytest.fixture(scope="module")
def setup():
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=30, n_windows=4, n_cycles=50, noise_peaks_per_spectrum=30)
    )
    dia = DiaData.from_spectra(spectra)
    rng = np.random.default_rng(1)
    B, Q = 6, 9
    slot_idx = rng.integers(1, dia.n_slots, (B, Q)).astype(np.int32)
    slot_idx[0, -2:] = -1  # masked queries
    query_mz = rng.uniform(250, 1200, (B, Q)).astype(np.float32)
    cycle_start = rng.integers(-4, dia.n_cycles - 8, B).astype(np.int32)
    return dia, slot_idx, query_mz, cycle_start


@pytest.mark.parametrize("with_mz", [False, True])
def test_pallas_matches_xla(setup, with_mz):
    dia, slot_idx, query_mz, cycle_start = setup
    W = 24
    kw = dict(
        n_cycles=dia.n_cycles,
        n_bins=dia.n_bins,
        bin_mz_min=dia.bin_mz_min,
        bin_width=dia.coarse_bin_width,
        slab=128,
        window_len=W,
        with_mz=with_mz,
    )
    dev = dia.device_arrays()
    xla = extract_xic(
        dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
        slot_idx, query_mz, np.float32(50.0), cycle_start, **kw,
    )
    pls = extract_xic_pallas(
        dev["peak_packed"], dev["cell_start"],
        slot_idx, query_mz, np.float32(50.0), cycle_start,
        interpret=True, **kw,
    )
    if with_mz:
        np.testing.assert_allclose(np.asarray(pls[0]), np.asarray(xla[0]), rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pls[1]), np.asarray(xla[1]), rtol=1e-5, atol=1e-2)
    else:
        np.testing.assert_allclose(np.asarray(pls), np.asarray(xla), rtol=1e-5, atol=1e-3)
        assert float(np.asarray(pls).sum()) > 0  # non-trivial signal


def test_pallas_scan_filter_matches_xla():
    """4D candidate scan-window crop: pallas (scanbin rides the packed
    store) vs XLA (explicit peak_scanbin array) must agree."""
    spectra, _, _ = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=30, n_windows=4, n_cycles=50,
            noise_peaks_per_spectrum=30, with_mobility=True,
        )
    )
    dia = DiaData.from_spectra(spectra, n_scan_bins=8)
    rng = np.random.default_rng(3)
    B, Q = 5, 7
    slot_idx = rng.integers(1, dia.n_slots, (B, Q)).astype(np.int32)
    query_mz = rng.uniform(250, 1200, (B, Q)).astype(np.float32)
    cycle_start = rng.integers(0, dia.n_cycles - 8, B).astype(np.int32)
    scan_lo = rng.integers(0, 4, B).astype(np.int32)
    scan_hi = (scan_lo + rng.integers(2, 5, B)).astype(np.int32)
    W = 16
    kw = dict(
        n_cycles=dia.n_cycles, n_bins=dia.n_bins, bin_mz_min=dia.bin_mz_min,
        bin_width=dia.coarse_bin_width, slab=128, window_len=W, with_mz=True,
    )
    dev = dia.device_arrays()
    xla_i, xla_m = extract_xic(
        dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
        slot_idx, query_mz, np.float32(50.0), cycle_start,
        peak_scanbin=dev["peak_scanbin"], scan_lo=scan_lo, scan_hi=scan_hi,
        **kw,
    )
    pls_i, pls_m = extract_xic_pallas(
        dev["peak_packed"], dev["cell_start"],
        slot_idx, query_mz, np.float32(50.0), cycle_start,
        scan_lo=scan_lo, scan_hi=scan_hi, interpret=True, **kw,
    )
    np.testing.assert_allclose(np.asarray(pls_i), np.asarray(xla_i), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pls_m), np.asarray(xla_m), rtol=1e-5, atol=1e-2)
    # the crop removes signal relative to the unfiltered extraction
    full = extract_xic(
        dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
        slot_idx, query_mz, np.float32(50.0), cycle_start, **kw,
    )[0]
    assert float(np.asarray(xla_i).sum()) < float(np.asarray(full).sum())
