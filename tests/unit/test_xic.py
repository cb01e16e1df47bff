import numpy as np

from alphadia_tpu.ops.xic import extract_xic, ref_extract_xic_numpy
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


def _setup():
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=30, n_windows=4, n_cycles=50, noise_peaks_per_spectrum=30)
    )
    dia = DiaData.from_spectra(spectra)
    return dia, prec, frag


def _xic_kwargs(dia, W, slab=256):
    return dict(
        n_cycles=dia.n_cycles,
        n_bins=dia.n_bins,
        bin_mz_min=dia.bin_mz_min,
        bin_width=dia.coarse_bin_width,
        slab=slab,
        window_len=W,
    )


def test_extract_xic_matches_numpy_reference():
    dia, prec, frag = _setup()
    rng = np.random.default_rng(0)

    B, Q, W = 8, 6, 16
    rows = rng.choice(len(prec), B, replace=False)
    slot_idx = np.zeros((B, Q), np.int32)
    query_mz = np.zeros((B, Q), np.float32)
    cycle_start = np.zeros(B, np.int32)
    for i, r in enumerate(rows):
        p = prec.iloc[r]
        slots = dia.ms2_slots_for_mz(float(p.mz_library))
        f0 = int(p.flat_frag_start_idx)
        mzs = frag.mz_library.values[f0 : f0 + Q]
        slot_idx[i, : len(mzs)] = slots[0]
        slot_idx[i, len(mzs) :] = -1
        query_mz[i, : len(mzs)] = mzs
        cycle_start[i] = max(0, int(p._truth_rt / 1.5) - W // 2)

    tol = 10.0
    dev = dia.device_arrays()
    got_i, got_mz = extract_xic(
        dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
        slot_idx, query_mz, np.float32(tol), cycle_start,
        with_mz=True, **_xic_kwargs(dia, W),
    )
    want_i, want_mz = ref_extract_xic_numpy(
        dia, slot_idx, query_mz, tol, cycle_start, W, with_mz=True
    )
    # prefix-sum accumulation order differs from direct summation: allow
    # float32 roundoff-scale deviations
    np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_mz), want_mz, rtol=1e-5, atol=5e-3)
    detectable = prec.iloc[rows]._truth_detectable.values
    assert (np.asarray(got_i).sum(axis=(1, 2))[detectable] > 0).all()


def test_extract_xic_bin_boundary_query():
    """Query whose ppm window straddles a coarse bin edge must combine both."""
    dia, prec, frag = _setup()
    # a query exactly on a bin boundary with wide tolerance
    edge = dia.bin_mz_min + (dia.n_bins // 2) * dia.coarse_bin_width
    slot_idx = np.full((1, 1), 1, np.int32)
    query_mz = np.array([[edge]], np.float32)
    dev = dia.device_arrays()
    got = extract_xic(
        dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
        slot_idx, query_mz, np.float32(100.0), np.zeros(1, np.int32),
        **_xic_kwargs(dia, 32),
    )
    want = ref_extract_xic_numpy(dia, slot_idx, query_mz, 100.0, np.zeros(1, np.int32), 32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-3)


def test_extract_xic_window_clipping():
    dia, prec, frag = _setup()
    slot_idx = np.full((2, 3), 1, np.int32)
    query_mz = np.full((2, 3), 500.0, np.float32)
    cycle_start = np.array([-8, dia.n_cycles - 4], np.int32)
    dev = dia.device_arrays()
    out = extract_xic(
        dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
        slot_idx, query_mz, np.float32(50.0), cycle_start,
        **_xic_kwargs(dia, 16),
    )
    out = np.asarray(out)
    assert (out[0, :, :8] == 0).all()
    assert (out[1, :, 4:] == 0).all()


def test_extract_xic_slab_overflow_is_clamped():
    """A tiny slab must not crash; it under-counts but stays finite."""
    dia, prec, frag = _setup()
    slot_idx = np.full((1, 2), 1, np.int32)
    query_mz = np.full((1, 2), 500.0, np.float32)
    out = extract_xic(
        dia.device_arrays()["peak_mz"],
        dia.device_arrays()["peak_intensity"],
        dia.device_arrays()["cell_start"],
        slot_idx, query_mz, np.float32(20.0), np.zeros(1, np.int32),
        **_xic_kwargs(dia, 32, slab=4),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_extract_xic_jit_matches_eager_wide_store():
    """Regression: jit and eager extraction must agree on a many-slot
    store at W=128/B>=4. jax 0.9.0's XLA:CPU lowering of the default
    OOB-fill gather miscompiled these shapes (every cs_flat element came
    back as the int32 fill value, silently zeroing ALL XICs for 24-window
    schemes); ops/xic.py now uses flat clip-mode takes, which are
    semantically identical for the in-bounds-by-construction indices."""
    import jax
    import jax.numpy as jnp

    from alphadia_tpu.ops.xic import extract_xic
    from alphadia_tpu.rawdata import DiaData
    from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia

    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=60,
            n_windows=24,
            n_cycles=200,
            noise_peaks_per_spectrum=60,
            seed=17,
        )
    )
    dia = DiaData.from_spectra(spectra)
    dev = dia.device_arrays()

    det = prec[prec["_truth_detectable"]].iloc[0]
    fr = frag.iloc[
        int(det["flat_frag_start_idx"]) : int(det["flat_frag_stop_idx"])
    ]
    fmz = fr["mz_library"].to_numpy(np.float32)[:8]
    slot = 1 + int(
        (det["mz_library"] - 400.0) // ((1000.0 - 400.0) / 24)
    )
    cyc = int(np.searchsorted(dia.cycle_rt, det["_truth_rt"]))
    B = 5
    slots = np.full((B, len(fmz)), slot, np.int32)
    mzs = np.tile(fmz, (B, 1))
    c0 = np.full(B, max(cyc - 64, 0), np.int32)

    kw = dict(
        n_cycles=dia.n_cycles,
        n_bins=dia.n_bins,
        bin_mz_min=dia.bin_mz_min,
        bin_width=dia.coarse_bin_width,
        slab=256,
        window_len=128,
    )
    out_jit = np.asarray(
        extract_xic(
            dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
            jnp.asarray(slots), jnp.asarray(mzs), jnp.float32(15.0),
            jnp.asarray(c0), **kw,
        )
    )
    with jax.disable_jit():
        out_eager = np.asarray(
            extract_xic(
                dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
                jnp.asarray(slots), jnp.asarray(mzs), jnp.float32(15.0),
                jnp.asarray(c0), **kw,
            )
        )
    assert out_eager.sum() > 0  # the true signal is in the window
    np.testing.assert_allclose(out_jit, out_eager, rtol=1e-6)
