"""Small host-side helpers (reference: alphadia/utils.py)."""

from __future__ import annotations

import os
import re
from pathlib import Path


def expand_path(path: str) -> str:
    return os.path.abspath(os.path.expandvars(os.path.expanduser(path)))


def ceil_to_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def get_isotope_columns(columns) -> list[int]:
    """Return sorted isotope indices i for columns named 'i_<n>'."""
    pat = re.compile(r"^i_(\d+)$")
    out = []
    for c in columns:
        m = pat.match(str(c))
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def candidate_hash(precursor_idx, rank):
    """Pack (precursor_idx, rank) into an int64 candidate identity.

    (reference: alphadia/fragcomp/utils.py:11-48)
    """
    import numpy as np

    return np.asarray(precursor_idx, dtype=np.int64) + (
        np.asarray(rank, dtype=np.int64) << 32
    )


def windows_to_slices(window_df) -> list[slice]:
    """Convert a df with start/stop columns into python slices."""
    return [slice(int(a), int(b)) for a, b in zip(window_df["start"], window_df["stop"])]


def ensure_dir(path: str | Path) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p
