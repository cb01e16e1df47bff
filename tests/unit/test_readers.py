import numpy as np
import pytest

from alphadia_tpu.rawdata.hdf import read_alpharaw_hdf, save_spectra_hdf
from alphadia_tpu.rawdata.mzml import read_mzml
from alphadia_tpu.rawdata.source import load_raw_file
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


from alphadia_tpu.testing.mzml_writer import write_mzml as _write_mzml_shared


def _write_mzml(path, spectra, compress=True):
    _write_mzml_shared(path, spectra, compress=compress)


@pytest.fixture(scope="module")
def small_spectra():
    spectra, *_ = make_synthetic_dia(
        SyntheticConfig(n_peptides=20, n_windows=3, n_cycles=20, noise_peaks_per_spectrum=10)
    )
    return spectra


@pytest.mark.parametrize("compress", [True, False])
def test_mzml_roundtrip(tmp_path, small_spectra, compress):
    p = tmp_path / "test.mzML"
    _write_mzml(p, small_spectra, compress=compress)
    out = read_mzml(p)
    assert out.n_spectra == small_spectra.n_spectra
    np.testing.assert_allclose(out.rt, small_spectra.rt, atol=1e-3)
    np.testing.assert_array_equal(out.ms_level, small_spectra.ms_level)
    np.testing.assert_allclose(
        out.isolation_lower_mz, small_spectra.isolation_lower_mz, atol=1e-4
    )
    np.testing.assert_allclose(out.mz, small_spectra.mz, rtol=1e-6)
    np.testing.assert_allclose(out.intensity, small_spectra.intensity, rtol=1e-5)
    # dispatch by extension works
    out2 = load_raw_file(p)
    assert out2.n_spectra == out.n_spectra


def test_profile_mode_centroiding(tmp_path):
    """Profile-mode mzML is centroided on read: gaussian traces around
    known m/z values come back as single peaks at the weighted centroid
    with the summed intensity (truth recovered to ~1e-4 Th)."""
    from alphadia_tpu.rawdata.mzml import centroid_profile
    from alphadia_tpu.rawdata.source import SpectrumData

    # build one profile spectrum: 3 gaussian peaks + a zero gap
    truth_mz = np.array([400.2, 500.5, 500.56], np.float64)
    truth_int = np.array([1000.0, 800.0, 600.0])
    grid = np.arange(399.9, 501.0, 0.01)
    trace = np.zeros_like(grid)
    for m, h in zip(truth_mz, truth_int):
        trace += h * np.exp(-0.5 * ((grid - m) / 0.015) ** 2)
    trace[trace < 1.0] = 0.0

    # direct function: the two overlapping peaks at 500.5/500.56 split at
    # the valley, the isolated one centroids exactly
    cmz, cint, _ = centroid_profile(
        grid.astype(np.float32), trace.astype(np.float32)
    )
    assert len(cmz) == 3
    np.testing.assert_allclose(cmz[0], 400.2, atol=1e-3)
    np.testing.assert_allclose(cmz[1], 500.5, atol=5e-3)
    np.testing.assert_allclose(cmz[2], 500.56, atol=5e-3)
    assert (np.diff(cmz) > 0).all()

    # through the mzML reader (profile cvParam set)
    spectra = SpectrumData(
        rt=np.array([10.0], np.float32),
        ms_level=np.array([1], np.uint8),
        isolation_lower_mz=np.array([-1.0], np.float32),
        isolation_upper_mz=np.array([-1.0], np.float32),
        peak_start_idx=np.array([0], np.int64),
        peak_stop_idx=np.array([len(grid)], np.int64),
        mz=grid.astype(np.float32),
        intensity=trace.astype(np.float32),
    )
    p = tmp_path / "profile.mzML"
    _write_mzml_shared(p, spectra, profile=True)
    out = read_mzml(p)
    assert out.peak_stop_idx[0] - out.peak_start_idx[0] == 3
    np.testing.assert_allclose(out.mz[0], 400.2, atol=1e-3)


def test_mzml_gz_roundtrip(tmp_path, small_spectra):
    """Gzipped mzML (.mzML.gz, the common converter output) parses
    identically and dispatches by the double extension, including the
    spectra-cache path keyed on the full name."""
    import gzip

    plain = tmp_path / "test.mzML"
    _write_mzml(plain, small_spectra)
    gz = tmp_path / "test.mzML.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))

    out = load_raw_file(gz)
    assert out.n_spectra == small_spectra.n_spectra
    np.testing.assert_allclose(out.mz, small_spectra.mz, rtol=1e-6)

    from alphadia_tpu.workflow.managers.raw_file_manager import RawFileManager

    mgr = RawFileManager()
    cached = mgr._load_with_cache(str(gz), thread_count=1)
    assert cached.n_spectra == out.n_spectra
    assert (tmp_path / "test.mzML.gz.cache.hdf").exists()
    # second load hits the cache
    again = mgr._load_with_cache(str(gz), thread_count=1)
    np.testing.assert_allclose(again.mz, out.mz, rtol=1e-6)


def test_hdf_roundtrip(tmp_path, small_spectra):
    p = tmp_path / "test.hdf"
    save_spectra_hdf(p, small_spectra)
    out = read_alpharaw_hdf(p)
    np.testing.assert_allclose(out.rt, small_spectra.rt)
    np.testing.assert_allclose(out.mz, small_spectra.mz)


def test_alpharaw_layout(tmp_path, small_spectra):
    """Emulate the alphaRaw HDF layout (minutes RT, nested group)."""
    import h5py

    p = tmp_path / "alpharaw.hdf"
    with h5py.File(p, "w") as f:
        g = f.create_group("ms_data")
        spec = g.create_group("spectrum_df")
        spec.create_dataset("rt", data=small_spectra.rt / 60.0)
        spec.create_dataset("ms_level", data=small_spectra.ms_level)
        spec.create_dataset("isolation_lower_mz", data=small_spectra.isolation_lower_mz)
        spec.create_dataset("isolation_upper_mz", data=small_spectra.isolation_upper_mz)
        spec.create_dataset("peak_start_idx", data=small_spectra.peak_start_idx)
        spec.create_dataset("peak_stop_idx", data=small_spectra.peak_stop_idx)
        peak = g.create_group("peak_df")
        peak.create_dataset("mz", data=small_spectra.mz)
        peak.create_dataset("intensity", data=small_spectra.intensity)
    out = read_alpharaw_hdf(p)
    np.testing.assert_allclose(out.rt, small_spectra.rt, atol=1e-2)
    np.testing.assert_allclose(out.mz, small_spectra.mz)


def test_mzml_full_pipeline(tmp_path, small_spectra):
    """mzML file drives DiaData tensorization end to end."""
    from alphadia_tpu.rawdata import DiaData

    p = tmp_path / "run.mzML"
    _write_mzml(p, small_spectra)
    dia = DiaData.from_spectra(load_raw_file(p))
    assert dia.n_slots == 4
    assert dia.n_cycles == 20
