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
    # slot-major peak store consistency
    assert dia.bin_start.shape[0] == 5 and dia.bin_start.shape[1] == 60
    ends = dia.bin_start[..., -1]
    starts = dia.bin_start[..., 0]
    assert (ends >= starts).all()
    # monotone bins within each spectrum
    assert (np.diff(dia.bin_start, axis=-1) >= 0).all()
    # peaks sorted within each spectrum
    flat = dia.bin_start.reshape(-1, dia.bin_start.shape[-1])
    for spec in range(0, flat.shape[0], 37):
        a, b = flat[spec, 0], flat[spec, -1]
        assert (np.diff(dia.peak_mz[a:b]) >= 0).all()


def test_bin_index_matches_searchsorted():
    spectra, *_ = make_synthetic_dia(small_cfg())
    dia = DiaData.from_spectra(spectra)
    flat = dia.bin_start.reshape(-1, dia.bin_start.shape[-1])
    n_bins = flat.shape[1] - 1
    for spec in [0, 17, 120]:
        a, b = flat[spec, 0], flat[spec, -1]
        mzs = dia.peak_mz[a:b]
        for bin_i in range(0, n_bins, 97):
            edge = dia.bin_mz_min + bin_i * dia.coarse_bin_width
            expected = a + np.searchsorted(mzs, edge)
            if bin_i == 0:
                expected = a
            assert flat[spec, bin_i] == expected


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
    # corrupt MS1 periodicity by deleting one MS1 spectrum
    keep = np.ones(spectra.n_spectra, dtype=bool)
    keep[5 * 5] = False  # an MS1 spectrum
    spectra2 = spectra.select(keep)
    dia = DiaData.from_spectra(spectra2)
    assert not dia.has_ms1
    assert dia.n_slots == 4  # MS2-only cycle
