"""4D (ion mobility) XIC extraction: jax kernel vs numpy ground truth."""

import numpy as np
import pytest

from alphadia_tpu.ops.xic import extract_xic_4d, ref_extract_xic_4d_numpy
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


@pytest.fixture(scope="module")
def dia4d():
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=60,
            n_windows=4,
            n_cycles=64,
            noise_peaks_per_spectrum=30,
            seed=17,
            with_mobility=True,
        )
    )
    dia = DiaData.from_spectra(spectra, n_scan_bins=8)
    return dia, prec, frag


def test_peak_store_carries_scanbins(dia4d):
    dia, _, _ = dia4d
    assert dia.has_mobility
    assert dia.n_scan_bins == 8
    sb = dia.peak_scanbin[: dia.n_stored_peaks]
    assert sb.min() >= 0 and sb.max() < 8
    # real data spreads over several bins
    assert len(np.unique(sb)) >= 4
    assert len(dia.mobility_values) == 8


def test_extract_xic_4d_matches_reference(dia4d):
    dia, prec, frag = dia4d
    arr = dia.device_arrays()
    rng = np.random.default_rng(0)

    # query a few planted fragments + random misses
    rows = prec[prec["_truth_detectable"]].head(4)
    q_mz, q_slot = [], []
    for _, p in rows.iterrows():
        fs = frag["mz_library"].to_numpy()[
            int(p.flat_frag_start_idx) : int(p.flat_frag_start_idx) + 3
        ]
        slots = dia.ms2_slots_for_mz(float(p.mz_library))
        s = int(slots[0]) if len(slots) else -1
        q_mz.append(list(fs * (1 + 4e-6)) + [rng.uniform(300, 1200)])
        q_slot.append([s] * 3 + [s])
    q_mz = np.array(q_mz, np.float32)
    q_slot = np.array(q_slot, np.int32)
    c0 = np.array(
        [max(0, int(r._truth_rt / 1.5) - 8) for _, r in rows.iterrows()], np.int32
    )

    W = 16
    got = np.asarray(
        extract_xic_4d(
            arr["peak_mz"], arr["peak_intensity"], arr["peak_scanbin"],
            arr["cell_start"], q_slot, q_mz, np.float32(10.0), c0,
            n_cycles=dia.n_cycles, n_bins=dia.n_bins,
            bin_mz_min=dia.bin_mz_min, bin_width=dia.coarse_bin_width,
            n_scan_bins=dia.n_scan_bins, slab=256, window_len=W,
        )
    )
    want = ref_extract_xic_4d_numpy(dia, q_slot, q_mz, 10.0, c0, W)
    assert got.shape == (4, 4, 8, W)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)
    # the planted queries actually hit something
    assert got[:, :3].sum() > 0


def test_4d_collapses_to_3d_sum(dia4d):
    """Summing the scan axis reproduces the 3D XIC."""
    from alphadia_tpu.ops.xic import extract_xic

    dia, prec, frag = dia4d
    arr = dia.device_arrays()
    p = prec[prec["_truth_detectable"]].iloc[0]
    slots = dia.ms2_slots_for_mz(float(p.mz_library))
    q_mz = frag["mz_library"].to_numpy()[
        int(p.flat_frag_start_idx) : int(p.flat_frag_stop_idx)
    ][None, :].astype(np.float32)
    q_slot = np.full_like(q_mz, int(slots[0]), dtype=np.int32)
    c0 = np.array([max(0, int(p._truth_rt / 1.5) - 8)], np.int32)
    kw = dict(
        n_cycles=dia.n_cycles, n_bins=dia.n_bins, bin_mz_min=dia.bin_mz_min,
        bin_width=dia.coarse_bin_width, slab=256, window_len=16,
    )
    x3 = np.asarray(
        extract_xic(
            arr["peak_mz"], arr["peak_intensity"], arr["cell_start"],
            q_slot, q_mz, np.float32(10.0), c0, **kw,
        )
    )
    x4 = np.asarray(
        extract_xic_4d(
            arr["peak_mz"], arr["peak_intensity"], arr["peak_scanbin"],
            arr["cell_start"], q_slot, q_mz, np.float32(10.0), c0,
            n_scan_bins=dia.n_scan_bins, **kw,
        )
    )
    np.testing.assert_allclose(x4.sum(axis=2), x3, rtol=1e-5, atol=1e-2)
