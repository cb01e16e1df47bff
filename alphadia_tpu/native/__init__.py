"""Native (C++) runtime components, loaded via ctypes.

Compiled lazily with g++ on first use and cached next to the source; every
entry point has a pure-numpy fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from alphadia_tpu.reporting import logger

_SRC = Path(__file__).parent / "peakstore.cpp"
_lib = None
_load_failed = False


def _lib_candidates() -> list[Path]:
    """Build locations in preference order: next to the source (fastest
    reuse, but read-only for non-root installs), then a per-user cache
    (covers containers that run as an unprivileged user over a root-owned
    site-packages — the .so lands in ~/.cache and persists across runs)."""
    import os

    cache_root = Path(
        os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
    )
    return [
        Path(__file__).parent / "_peakstore.so",
        cache_root / "alphadia_tpu" / "_peakstore.so",
    ]


def _build(lib_path: Path) -> bool:
    try:
        import os

        lib_path.parent.mkdir(parents=True, exist_ok=True)
        # ALPHADIA_TPU_NATIVE_ARCH overrides for builds that must run on a
        # DIFFERENT host than they compile on (container image prebuilds
        # pin a portable baseline; -march=native would SIGILL elsewhere)
        arch = os.environ.get("ALPHADIA_TPU_NATIVE_ARCH", "native")
        cmd = [
            "g++", "-O3", f"-march={arch}", "-fopenmp", "-shared", "-fPIC",
            str(_SRC), "-o", str(lib_path),
        ]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if res.returncode != 0:
            logger.warning(f"native build failed at {lib_path}: {res.stderr[:500]}")
            return False
        return True
    except Exception as e:
        logger.warning(f"native build unavailable at {lib_path}: {e}")
        return False


def _build_or_find() -> Path | None:
    for lib_path in _lib_candidates():
        if lib_path.exists() and lib_path.stat().st_mtime >= _SRC.stat().st_mtime:
            return lib_path
    for lib_path in _lib_candidates():
        if _build(lib_path):
            return lib_path
    return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        lib_path = _build_or_find()
        if lib_path is None:
            _load_failed = True
            return None
        lib = ctypes.CDLL(str(lib_path))
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        lib.peakstore_count.restype = ctypes.c_int64
        lib.peakstore_count.argtypes = [
            f32p, ctypes.c_int64, i64p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_int32, ctypes.c_double,
            i64p, i64p, u8p,
        ]
        lib.peakstore_scatter.restype = None
        lib.peakstore_scatter.argtypes = [
            f32p, f32p, i64p, i64p, u8p,
            ctypes.c_int64, ctypes.c_int64,
            f32p, f32p, u8p, i64p,
        ]
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        lib.peakstore_scatter_sb.restype = None
        lib.peakstore_scatter_sb.argtypes = [
            f32p, f32p, i32p, i64p, i64p, u8p,
            ctypes.c_int64, ctypes.c_int64,
            f32p, f32p, u8p, i32p, i64p,
        ]
        _lib = lib
        return _lib
    except Exception as e:
        logger.warning(f"native library load failed: {e}")
        _load_failed = True
        return None


def build_peak_store_native(
    mz: np.ndarray,
    intensity: np.ndarray,
    spec_start: np.ndarray,
    n_slots: int,
    n_cycles: int,
    bin_mz_min: float,
    bin_width: float,
    n_bins: int,
    ghost: float,
    scanbin: np.ndarray | None = None,
):
    """C++ peak-store build.

    Returns ``(mz, intensity, is_ghost, cell_start, scanbin)`` — scanbin
    is None for 3D data (no per-peak mobility) — or None when the native
    library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(mz)
    mz = np.ascontiguousarray(mz, np.float32)
    inten = np.ascontiguousarray(intensity, np.float32)
    spec_start = np.ascontiguousarray(spec_start, np.int64)
    keys = np.empty(3 * n, np.int64)
    src = np.empty(3 * n, np.int64)
    ghost_flags = np.empty(3 * n, np.uint8)
    n_spectra = len(spec_start) - 1
    total = lib.peakstore_count(
        mz, n, spec_start, n_spectra, n_slots, n_cycles,
        float(bin_mz_min), float(bin_width), n_bins, float(ghost),
        keys, src, ghost_flags,
    )
    n_cells = n_slots * n_bins * n_cycles
    out_mz = np.empty(total, np.float32)
    out_int = np.empty(total, np.float32)
    out_ghost = np.empty(total, np.uint8)
    cell_off = np.zeros(n_cells + 1, np.int64)
    if scanbin is not None:
        out_sb = np.empty(total, np.int32)
        lib.peakstore_scatter_sb(
            mz, inten, np.ascontiguousarray(scanbin, np.int32),
            keys[:total], src[:total], ghost_flags[:total],
            total, n_cells, out_mz, out_int, out_ghost, out_sb, cell_off,
        )
        return out_mz, out_int, out_ghost.astype(bool), cell_off, out_sb
    lib.peakstore_scatter(
        mz, inten, keys[:total], src[:total], ghost_flags[:total],
        total, n_cells, out_mz, out_int, out_ghost, cell_off,
    )
    return out_mz, out_int, out_ghost.astype(bool), cell_off, None
