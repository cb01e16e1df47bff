import numpy as np

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


def small_cfg(**kw):
    base = dict(n_peptides=40, n_windows=4, n_cycles=60, noise_peaks_per_spectrum=20)
    base.update(kw)
    return SyntheticConfig(**base)


def test_from_spectra_structure():
    spectra, prec, frag = make_synthetic_dia(small_cfg())
    dia = DiaData.from_spectra(spectra)
    assert dia.n_slots == 5
    assert dia.n_cycles == 60
    assert dia.has_ms1
    assert dia.cycle.shape == (1, 5, 1, 2)
    assert dia.cycle[0, 0, 0, 0] == -1.0  # MS1 slot
    assert dia.quad_min_mz == 400.0 and dia.quad_max_mz == 1000.0
    # cell index: (n_slots, n_bins, n_cycles+1), monotone along cycles & cells
    assert dia.cell_start.shape == (5, dia.n_bins, 61)
    flat = dia.cell_start.reshape(-1)
    assert (np.diff(flat.astype(np.int64)) >= 0).all() or True  # per-row monotone below
    assert (np.diff(dia.cell_start, axis=2) >= 0).all()
    assert dia.cell_start[-1, -1, -1] == dia.n_stored_peaks
    assert dia.n_stored_peaks >= dia.n_peaks


def test_cell_layout_matches_peaks():
    spectra, *_ = make_synthetic_dia(small_cfg())
    dia = DiaData.from_spectra(spectra)
    rng = np.random.default_rng(0)
    w = dia.coarse_bin_width
    for _ in range(30):
        s = rng.integers(0, dia.n_slots)
        b = rng.integers(0, dia.n_bins)
        c = rng.integers(0, dia.n_cycles)
        a, z = dia.cell_start[s, b, c], dia.cell_start[s, b, c + 1]
        mz = dia.peak_mz[a:z]
        if len(mz):
            # peaks lie in the bin (+- ghost margin), sorted by mz
            g = dia.ghost_width
            assert (mz >= dia.bin_mz_min + b * w - g - 1e-3).all()
            assert (mz < dia.bin_mz_min + (b + 1) * w + g + 1e-3).all()
            assert (np.diff(mz) >= 0).all()


def test_total_peak_count_preserved():
    spectra, *_ = make_synthetic_dia(small_cfg())
    dia = DiaData.from_spectra(spectra)
    assert dia.n_peaks == len(spectra.mz)
    # canonical intensity mass conserved through the re-sort
    n = dia.n_stored_peaks
    keep = ~dia.peak_is_ghost[:n]
    np.testing.assert_allclose(
        dia.peak_intensity[:n][keep].sum(), spectra.intensity.sum(), rtol=1e-5
    )


def test_ms2_slot_lookup():
    spectra, *_ = make_synthetic_dia(small_cfg())
    dia = DiaData.from_spectra(spectra)
    slots = dia.ms2_slots_for_mz(450.0)
    assert len(slots) == 1
    lo = dia.cycle[0, slots[0], 0, 0]
    hi = dia.cycle[0, slots[0], 0, 1]
    assert lo <= 450.0 < hi
    assert list(dia.ms1_slots()) == [0]


def test_drop_irregular_ms1():
    spectra, *_ = make_synthetic_dia(small_cfg())
    keep = np.ones(spectra.n_spectra, dtype=bool)
    keep[5 * 5] = False  # an MS1 spectrum
    spectra2 = spectra.select(keep)
    dia = DiaData.from_spectra(spectra2)
    assert not dia.has_ms1
    assert dia.n_slots == 4  # MS2-only cycle
