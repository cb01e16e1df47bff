"""Load reference alphaDIA modules as pure-Python test oracles.

The reference implementation (when present at ``/root/reference``) is the
ground truth this engine re-implements.  Its hot modules are numba-jitted
and depend on vendor packages (numba/alphatims/rocket_fft) that are not
installable here — but the *python semantics* of the decorated functions
are exactly what we want to compare against, so this module installs
no-op stand-ins for those decorators and imports the reference modules to
execute them as plain Python on small inputs.

Nothing here is imported by the engine itself; it exists only so the
parity tests can diff our numerics against the reference's directly.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")


def _decorator(*args, **kwargs):
    """A decorator usable bare (@njit) or parameterized (@njit(cache=True))."""
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(obj):
        return obj

    return deco


class _TypeExpr:
    """Stands in for numba type expressions (nb.float64[:, ::1] etc.).

    When built from a concrete numpy scalar type it carries a ``dtype``
    attribute, which ``np.dtype()`` (and therefore ``ndarray.astype``)
    falls back to — so reference code like ``arr.astype(nb.float32)``
    works pure-python.
    """

    def __init__(self, np_dtype=None):
        if np_dtype is not None:
            self.dtype = np.dtype(np_dtype)

    def __getitem__(self, item):
        return self

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        if name.startswith("__") or name == "dtype":
            raise AttributeError(name)
        try:
            return _TypeExpr(np.dtype(name))
        except TypeError:
            return _TypeExpr()


def _pjit(*a, **k):
    """alphatims.utils.pjit: decorated f(thread_idx, *args) is called with
    an iterable first argument and fanned out over threads; serially here."""

    def deco(f):
        def wrapper(indices, *args, **kw):
            for i in np.asarray(list(indices)).ravel():
                f(int(i), *args, **kw)

        return wrapper

    if len(a) == 1 and callable(a[0]) and not k:
        return deco(a[0])
    return deco


def install_stubs() -> None:
    if "numba" in sys.modules and not hasattr(sys.modules["numba"], "_parity_stub"):
        raise RuntimeError("a real numba is importable; stubbing would shadow it")
    if "numba" in sys.modules:
        return

    nb = types.ModuleType("numba")
    nb._parity_stub = True
    nb.njit = _decorator
    nb.jit = _decorator
    nb.vectorize = _decorator
    nb.guvectorize = _decorator
    nb.prange = range
    nb.set_num_threads = lambda n: None
    for t in (
        "float32", "float64", "int8", "int16", "int32", "int64",
        "uint8", "uint16", "uint32", "uint64",
    ):
        setattr(nb, t, _TypeExpr(getattr(np, t)))
    nb.boolean = _TypeExpr(np.bool_)
    nb.types = _TypeExpr()

    def _jitclass(*args, **kwargs):
        """jitclass stand-in: returns the class unchanged but attaches the
        ``class_type.instance_type`` attribute some reference modules read
        at import time (e.g. candidate.py:75 type annotations)."""

        def attach(cls):
            cls.class_type = types.SimpleNamespace(instance_type=cls)
            return cls

        if len(args) == 1 and isinstance(args[0], type) and not kwargs:
            return attach(args[0])
        return attach

    class _ObjMode:
        """``with nb.objmode(...):`` / ``with nb.objmode:`` no-op."""

        def __call__(self, *a, **k):
            return self

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _TypedDict(dict):
        @staticmethod
        def empty(key_type=None, value_type=None):
            return {}

    class _TypedList(list):
        @staticmethod
        def empty_list(t=None):
            return []

    experimental = types.ModuleType("numba.experimental")
    experimental.jitclass = _jitclass
    extending = types.ModuleType("numba.extending")
    extending.overload = lambda *a, **k: (lambda f: f)
    extending.overload_method = lambda *a, **k: (lambda f: f)
    extending.register_jitable = _decorator
    typed = types.ModuleType("numba.typed")
    typed.List = _TypedList
    typed.Dict = _TypedDict
    nb.objmode = _ObjMode()
    core = types.ModuleType("numba.core")
    core.types = _TypeExpr()

    alphatims = types.ModuleType("alphatims")
    atutils = types.ModuleType("alphatims.utils")
    atutils.pjit = _pjit
    atutils.njit = _decorator
    atutils.set_threads = lambda n: n
    alphatims.utils = atutils

    def _module_getattr(name):
        # never answer dunder probes (__file__, __path__, …): inspect &
        # importlib walk sys.modules and would choke on fake values
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None

    rocket = types.ModuleType("rocket_fft")
    rocket.__getattr__ = _module_getattr
    rocket_ov = types.ModuleType("rocket_fft.overloads")
    rocket_ov.__getattr__ = _module_getattr

    # alpharaw / alphatims.bruker: vendor reader base classes. Only the
    # class objects are needed (alphadia.raw_data wrappers subclass them);
    # the whole-pipeline parity tests construct the JIT data object
    # directly from arrays and never call a vendor loader.
    class _VendorBase:
        def __init__(self, *a, **k):
            pass

    alpharaw = types.ModuleType("alpharaw")
    ar_msdata = types.ModuleType("alpharaw.ms_data_base")
    ar_msdata.MSData_Base = _VendorBase
    ar_mzml = types.ModuleType("alpharaw.mzml")
    ar_mzml.MzMLReader = _VendorBase
    ar_sciex = types.ModuleType("alpharaw.sciex")
    ar_sciex.SciexWiffData = _VendorBase
    ar_thermo = types.ModuleType("alpharaw.thermo")
    ar_thermo.ThermoRawData = _VendorBase
    alpharaw.ms_data_base = ar_msdata
    alpharaw.mzml = ar_mzml
    alpharaw.sciex = ar_sciex
    alpharaw.thermo = ar_thermo

    atbruker = types.ModuleType("alphatims.bruker")
    atbruker.TimsTOF = _VendorBase
    alphatims.bruker = atbruker

    # alphabase: the reference's optimization lock builds per-batch
    # SpecLibFlat objects and compacts fragments with
    # remove_unused_fragments; both are trivial dataframe carriers here
    class _StubSpecLibFlat:
        """alphabase.spectral_library.flat.SpecLibFlat stand-in: a bare
        (_precursor_df, _fragment_df) carrier with the two read-only
        accessors the reference workflow uses."""

        def __init__(self, *a, **k):
            import pandas as _pd

            self._precursor_df = _pd.DataFrame()
            self._fragment_df = _pd.DataFrame()

        @property
        def precursor_df(self):
            return self._precursor_df

        @property
        def fragment_df(self):
            return self._fragment_df

    def _remove_unused_fragments(
        precursor_df,
        fragment_df_container,
        frag_start_col="flat_frag_start_idx",
        frag_stop_col="flat_frag_stop_idx",
    ):
        """alphabase.peptide.fragment.remove_unused_fragments stand-in:
        keep only fragment rows referenced by the given precursors and
        renumber the flat start/stop indices onto the compacted frame."""
        import numpy as _np
        import pandas as _pd

        (fragment_df,) = fragment_df_container
        precursor_df = precursor_df.copy()
        starts = precursor_df[frag_start_col].to_numpy(_np.int64)
        stops = precursor_df[frag_stop_col].to_numpy(_np.int64)
        pieces, new_starts, new_stops = [], [], []
        cursor = 0
        for s0, s1 in zip(starts, stops):
            pieces.append(fragment_df.iloc[s0:s1])
            new_starts.append(cursor)
            cursor += s1 - s0
            new_stops.append(cursor)
        out_frag = (
            _pd.concat(pieces, ignore_index=True)
            if pieces
            else fragment_df.iloc[:0].copy()
        )
        precursor_df[frag_start_col] = _np.asarray(new_starts, _np.int64)
        precursor_df[frag_stop_col] = _np.asarray(new_stops, _np.int64)
        return precursor_df, (out_frag,)

    # alphadia_search_rs: the reference's Rust NG backend extension. Only
    # class NAMES are imported at module scope; the python-backend paths
    # driven here never instantiate them.
    rs = types.ModuleType("alphadia_search_rs")
    for _name in (
        "DIAData", "SpecLibFlat", "PeakGroupSelection", "PeakGroupScoring",
        "PeakGroupQuantification", "SelectionParameters", "ScoringParameters",
        "QuantificationParameters", "CandidateCollection",
        "CandidateFeatureCollection", "SpecLibFlatQuantified",
    ):
        setattr(rs, _name, type(_name, (), {}))
    rs.set_num_threads = lambda n: None

    alphabase = types.ModuleType("alphabase")
    ab_speclib = types.ModuleType("alphabase.spectral_library")
    ab_speclib.__path__ = []  # mark as package for submodule imports
    ab_flat = types.ModuleType("alphabase.spectral_library.flat")
    ab_flat.SpecLibFlat = _StubSpecLibFlat
    ab_base = types.ModuleType("alphabase.spectral_library.base")
    ab_base.SpecLibBase = _StubSpecLibFlat  # type annotation use only
    ab_peptide = types.ModuleType("alphabase.peptide")
    ab_frag = types.ModuleType("alphabase.peptide.fragment")
    ab_frag.remove_unused_fragments = _remove_unused_fragments
    alphabase.spectral_library = ab_speclib
    ab_speclib.flat = ab_flat
    alphabase.peptide = ab_peptide
    ab_peptide.fragment = ab_frag

    mods = {
        "alpharaw": alpharaw,
        "alpharaw.ms_data_base": ar_msdata,
        "alpharaw.mzml": ar_mzml,
        "alpharaw.sciex": ar_sciex,
        "alpharaw.thermo": ar_thermo,
        "alphatims.bruker": atbruker,
        "alphadia_search_rs": rs,
        "alphabase": alphabase,
        "alphabase.spectral_library": ab_speclib,
        "alphabase.spectral_library.flat": ab_flat,
        "alphabase.spectral_library.base": ab_base,
        "alphabase.peptide": ab_peptide,
        "alphabase.peptide.fragment": ab_frag,
        "numba": nb,
        "numba.experimental": experimental,
        "numba.extending": extending,
        "numba.typed": typed,
        "numba.core": core,
        "alphatims": alphatims,
        "alphatims.utils": atutils,
        "rocket_fft": rocket,
        "rocket_fft.overloads": rocket_ov,
    }
    sys.modules.update(mods)
    nb.experimental = experimental
    nb.extending = extending
    nb.typed = typed
    nb.core = core

    # the reference targets pandas<3; restore the name it imports
    import pandas.errors

    if not hasattr(pandas.errors, "SettingWithCopyWarning"):

        class SettingWithCopyWarning(Warning):
            pass

        pandas.errors.SettingWithCopyWarning = SettingWithCopyWarning


def ref_module(dotted: str, file: str | None = None):
    """Import a reference module (``alphadia.x.y``) with stubs installed.

    ``file`` (path relative to the reference root) loads the module
    directly from its source file, bypassing heavyweight package
    ``__init__`` chains (e.g. ``alphadia.raw_data`` pulls alpharaw).
    """
    install_stubs()
    root = str(REFERENCE_ROOT)
    if root not in sys.path:
        sys.path.insert(0, root)
    if file is None:
        return importlib.import_module(dotted)
    key = f"_refparity_{dotted.replace('.', '_')}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(key, REFERENCE_ROOT / file)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


def _convolve_fourier_np(dense: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Numpy transliteration of the reference's numba-overloaded
    ``fft.convolve_fourier`` (reference: alphadia/search/selection/fft.py:
    139-212): circular 2D FFT convolution over the trailing two axes with
    the quadrant shift that recenters the kernel at ``kernel.shape // 2``.
    """
    k0, k1 = kernel.shape
    delta0, delta1 = -(k0 // 2), -(k1 // 2)
    shape2 = dense.shape[-2:]
    out = np.zeros_like(dense)
    fourier_filter = np.fft.rfft2(kernel, shape2)
    flat = dense.reshape((-1,) + shape2)
    oflat = out.reshape((-1,) + shape2)
    for i in range(flat.shape[0]):
        layer = np.fft.irfft2(np.fft.rfft2(flat[i]) * fourier_filter, shape2).astype(
            dense.dtype
        )
        oflat[i, delta0:, delta1:] = layer[:-delta0, :-delta1]
        oflat[i, :delta0, delta1:] = layer[-delta0:, :-delta1]
        oflat[i, delta0:, :delta1] = layer[:-delta0, -delta1:]
        oflat[i, :delta0, :delta1] = layer[-delta0:, -delta1:]
    return out


def _assemble_isotope_mz_np(mono_mz, charge, isotope_intensity):
    """Pure-python twin of the reference's overload-only
    ``assemble_isotope_mz`` (reference: search/selection/utils.py:21-42)."""
    offset = np.arange(len(isotope_intensity)) * 1.0033548350700006 / charge
    isotope_mz = np.zeros(len(isotope_intensity), dtype=np.float32)
    isotope_mz[:] = mono_mz
    isotope_mz += offset
    return isotope_mz


def _fragment_container_slice(inst, slices):
    """Pure-python twin of the overload-only ``FragmentContainer.slice``
    (reference: search/scoring/utils.py:413-478)."""
    idx = np.concatenate(
        [np.arange(start, stop) for start, stop, _step in slices]
    ).astype(np.int64) if len(slices) else np.zeros(0, np.int64)
    precursor_idx = np.concatenate(
        [np.full(stop - start, i, np.uint32) for i, (start, stop, _s) in enumerate(slices)]
    ) if len(slices) else np.zeros(0, np.uint32)
    cls = type(inst)
    f = cls(
        inst.mz_library[idx].astype(np.float32),
        inst.mz[idx].astype(np.float32),
        inst.intensity[idx].astype(np.float32),
        inst.type[idx].astype(np.uint8),
        inst.loss_type[idx].astype(np.uint8),
        inst.charge[idx].astype(np.uint8),
        inst.number[idx].astype(np.uint8),
        inst.position[idx].astype(np.uint8),
        inst.cardinality[idx].astype(np.uint8),
    )
    f.precursor_idx = precursor_idx
    return f


def patch_fft_numpy(selection_mod) -> None:
    """Give the loaded reference selection module a runnable
    ``convolve_fourier`` and ``assemble_isotope_mz`` (the real ones only
    exist as numba overloads)."""
    selection_mod.fft.convolve_fourier = _convolve_fourier_np
    selection_mod.assemble_isotope_mz = _assemble_isotope_mz_np


def patch_scoring_runtime(scoring_mod) -> None:
    """Attach the overload-only ``FragmentContainer.slice`` to the
    de-jitted class so ``Candidate.process`` runs pure-python."""
    scoring_mod.FragmentContainer.slice = _fragment_container_slice


def build_ref_alpharaw(spectra):
    """Construct the reference ``AlphaRawJIT`` (de-jitted by the stubs)
    from an alphadia_tpu ``SpectrumData`` — the same arrays our own
    ``DiaData.from_spectra`` consumes, so both engines read identical
    peaks.  Mirrors ``AlphaRaw._preprocess_raw_data`` + ``to_jitclass``
    (reference: alphadia/raw_data/alpharaw_wrapper.py:72-146) with RT
    already in seconds.
    """
    jit_mod = ref_module(
        "alphadia.search.jitclasses.alpharaw_jit",
        "alphadia/search/jitclasses/alpharaw_jit.py",
    )
    ms_level = np.asarray(spectra.ms_level)
    iso_lo = np.asarray(spectra.isolation_lower_mz, np.float64)
    iso_hi = np.asarray(spectra.isolation_upper_mz, np.float64)
    # acquisition starts at a cycle boundary (slot 0 = MS1) by construction
    slots_per_cycle = int(np.argmax(ms_level[1:] == 1)) + 1
    cycle = np.zeros((1, slots_per_cycle, 1, 2), dtype=np.float64)
    cycle[0, :, 0, 0] = iso_lo[:slots_per_cycle]
    cycle[0, :, 0, 1] = iso_hi[:slots_per_cycle]

    n_spectra = len(ms_level)
    ms2 = ms_level == 2
    return jit_mod.AlphaRawJIT(
        cycle,
        np.asarray(spectra.rt, np.float32),
        np.array([1e-6, 0.0], np.float32),  # DEFAULT_VALUE_NO_MOBILITY
        0,  # zeroth_frame
        np.float32(np.asarray(spectra.mz).max()),
        np.float32(np.asarray(spectra.mz).min()),
        np.float32(iso_hi[ms2].max()),
        np.float32(iso_lo[ms2].min()),
        n_spectra // slots_per_cycle,  # precursor_cycle_max_index
        np.asarray(spectra.peak_start_idx, np.int64),
        np.asarray(spectra.peak_stop_idx, np.int64),
        np.asarray(spectra.mz, np.float32),
        np.asarray(spectra.intensity, np.float32),
        1,  # scan_max_index (no mobility)
        n_spectra - 1,  # frame_max_index
    )


def build_ref_timstof(spectra, n_scans: int = 8):
    """Construct the reference ``TimsTOFTransposeJIT`` (de-jitted) from a
    4D ``SpectrumData``: per-peak mobilities quantized to ``n_scans``
    uniform bins (the same binning ``DiaData.from_spectra`` applies), then
    transposed to the TOF-indexed layout the reference 4D kernels expect
    (reference: alphadia/raw_data/bruker.py:156-274 `_transpose`,
    search/jitclasses/bruker_jit.py:56-135).

    alphatims scans are DESCENDING in mobility (scan 0 = highest 1/K0),
    so ascending bin b maps to scan ``n_scans - 1 - b``.
    """
    jit_mod = ref_module(
        "alphadia.search.jitclasses.bruker_jit",
        "alphadia/search/jitclasses/bruker_jit.py",
    )
    ms_level = np.asarray(spectra.ms_level)
    iso_lo = np.asarray(spectra.isolation_lower_mz, np.float64)
    iso_hi = np.asarray(spectra.isolation_upper_mz, np.float64)
    slots = int(np.argmax(ms_level[1:] == 1)) + 1
    S = int(n_scans)
    n_spectra = len(ms_level)

    mob = np.asarray(spectra.mobility, np.float64)
    mob_min, mob_max = float(mob.min()), float(mob.max())
    span = max(mob_max - mob_min, 1e-9)
    asc_bin = np.clip(((mob - mob_min) / span * S).astype(np.int64), 0, S - 1)
    scan = (S - 1) - asc_bin
    centers_asc = mob_min + (np.arange(S, dtype=np.float64) + 0.5) / S * span
    mobility_values = centers_asc[::-1].copy()

    # global TOF grid = sorted unique m/z values
    mz = np.asarray(spectra.mz, np.float64)
    mz_values, tof_of_peak = np.unique(mz, return_inverse=True)
    counts = (
        np.asarray(spectra.peak_stop_idx, np.int64)
        - np.asarray(spectra.peak_start_idx, np.int64)
    )
    frame_of_peak = np.repeat(np.arange(n_spectra, dtype=np.int64), counts)
    push = frame_of_peak * S + scan

    order = np.lexsort((push, tof_of_peak))
    push_indices = push[order].astype(np.uint32)
    intensity_values = np.asarray(spectra.intensity, np.float64)[order]
    tof_indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(tof_of_peak, minlength=len(mz_values)))]
    ).astype(np.int64)

    cycle = np.zeros((1, slots, S, 2), np.float64)
    cycle[0, :, :, 0] = iso_lo[:slots, None]
    cycle[0, :, :, 1] = iso_hi[:slots, None]
    dia_mz_cycle = cycle.reshape(-1, 2)
    dia_precursor_cycle = np.repeat(np.arange(slots, dtype=np.int64), S)

    ms2 = ms_level == 2
    return jit_mod.TimsTOFTransposeJIT(
        np.full(n_spectra, 0.1, np.float64),  # accumulation_times (unused)
        cycle,
        dia_mz_cycle,
        dia_precursor_cycle,
        n_spectra,  # frame_max_index
        np.ones(n_spectra, np.float64),  # intensity_corrections (unused)
        int(intensity_values.max()) + 1,
        0,
        intensity_values,
        0.1,  # max_accumulation_time (unused)
        mob_max,
        mob_min,
        mobility_values,
        mz_values,
        np.arange(slots, dtype=np.int64),  # precursor_indices (unused)
        slots,  # precursor_max_index
        np.zeros(1, np.int64),  # quad_indptr (unused)
        float(iso_hi[ms2].max()),
        float(iso_lo[ms2].min()),
        np.zeros((1, 2), np.float64, order="F"),  # quad_mz_values (unused)
        np.zeros(1, np.int64),  # raw_quad_indptr (unused)
        np.asarray(spectra.rt, np.float64),
        S,  # scan_max_index
        len(mz_values),  # tof_max_index
        0,
        False,  # zeroth_frame
        push_indices,
        tof_indptr,
    )
