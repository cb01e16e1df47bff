"""Spectral library containers.

Self-contained equivalents of alphabase's ``SpecLibBase`` (hierarchical:
per-precursor fragment matrices) and ``SpecLibFlat`` (flat fragment rows,
the search input) used throughout the reference
(reference: alphadia/libtransform/flatten.py:15-111).

Layout of ``SpecLibBase`` fragment matrices: one row per cleavage site of
each precursor (``frag_start_idx``/``frag_stop_idx`` delimit a precursor's
rows), one column per charged fragment type (e.g. ``b_z1``/``y_z2``).

Layout of ``SpecLibFlat.fragment_df`` (the on-device search contract,
validated by validation/schemas): mz_library f32, intensity f32, cardinality
u8, type u8 (ASCII of series letter), loss_type u8, charge u8, number u8,
position u8.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import xxhash

from alphadia_tpu.library import chem


def _str_col(df: pd.DataFrame, name: str):
    """Column as an iterable of strings; a SERIES of '' when absent.

    ``df.get(name, "")`` returns the scalar '' for a missing column —
    zipping against it yields ZERO iterations and silently produces empty
    results.
    """
    return df[name] if name in df.columns else pd.Series([""] * len(df))


def mod_seq_hash(sequence, mods) -> np.ndarray:
    """64-bit xxhash of modified sequence (vectorized over rows)."""
    return np.array(
        [
            xxhash.xxh64_intdigest(f"{s}|{m or ''}") & 0x7FFF_FFFF_FFFF_FFFF
            for s, m in zip(sequence, mods)
        ],
        dtype=np.int64,
    )


def mod_seq_charge_hash(sequence, mods, charge) -> np.ndarray:
    return np.array(
        [
            xxhash.xxh64_intdigest(f"{s}|{m or ''}|{int(c)}") & 0x7FFF_FFFF_FFFF_FFFF
            for s, m, c in zip(sequence, mods, charge)
        ],
        dtype=np.int64,
    )


class SpecLibBase:
    """Hierarchical spectral library: precursor table + fragment matrices."""

    def __init__(
        self,
        precursor_df: pd.DataFrame,
        fragment_mz_df: pd.DataFrame | None = None,
        fragment_intensity_df: pd.DataFrame | None = None,
    ):
        self.precursor_df = precursor_df
        self.fragment_mz_df = fragment_mz_df
        self.fragment_intensity_df = fragment_intensity_df

    @property
    def charged_frag_types(self) -> list[str]:
        return list(self.fragment_mz_df.columns) if self.fragment_mz_df is not None else []

    # ------------------------------------------------------------------
    def calc_precursor_mz(self) -> None:
        df = self.precursor_df
        df["precursor_mz"] = np.array(
            [
                chem.precursor_mz(s, int(z), m, ms)
                for s, z, m, ms in zip(
                    df["sequence"], df["charge"],
                    _str_col(df, "mods"), _str_col(df, "mod_sites"),
                )
            ],
            dtype=np.float32,
        )

    def calc_fragment_mz(self, max_charge: int = 2, types: tuple = ("b", "y")) -> None:
        """(Re)compute the fragment m/z matrices from sequences.

        When a fragment intensity matrix exists, its rows are remapped
        into the new layout first — precursor rows may have been
        reordered/subset since the intensities were laid out (multiplex
        channel sort, decoy generation), and leaving the old layout would
        silently pair each precursor with another one's intensities.
        """
        df = self.precursor_df
        naa = df["sequence"].str.len().to_numpy()
        n_rows = int((naa - 1).sum())
        cols = [f"{t}_z{z}" for t in types for z in range(1, max_charge + 1)]
        mz = np.zeros((n_rows, len(cols)), dtype=np.float32)
        start = np.zeros(len(df), dtype=np.int64)
        np.cumsum(naa[:-1] - 1, out=start[1:])

        if (
            self.fragment_intensity_df is not None
            and "frag_start_idx" in df.columns
        ):
            old_start = df["frag_start_idx"].to_numpy(np.int64)
            if not np.array_equal(old_start, start):  # identity -> skip
                counts = naa.astype(np.int64) - 1
                # vectorized row gather: src = old_start[p] + offset
                src = (
                    np.repeat(old_start, counts)
                    + np.arange(n_rows, dtype=np.int64)
                    - np.repeat(start, counts)
                )
                self.fragment_intensity_df = pd.DataFrame(
                    self.fragment_intensity_df.to_numpy()[src],
                    columns=self.fragment_intensity_df.columns,
                )

        for i, (s, m, ms) in enumerate(
            zip(df["sequence"], _str_col(df, "mods"), _str_col(df, "mod_sites"))
        ):
            ladders = chem.fragment_mz_arrays(s, m, ms, max_charge=max_charge, types=types)
            a = start[i]
            for j, c in enumerate(cols):
                mz[a : a + len(s) - 1, j] = ladders[c]
        self.fragment_mz_df = pd.DataFrame(mz, columns=cols)
        df["frag_start_idx"] = start.astype(np.uint32)
        df["frag_stop_idx"] = (start + naa - 1).astype(np.uint32)
        df["nAA"] = naa.astype(np.uint8)

    def hash_precursors(self) -> None:
        df = self.precursor_df
        mods = df["mods"] if "mods" in df.columns else [""] * len(df)
        df["mod_seq_hash"] = mod_seq_hash(df["sequence"], mods)
        df["mod_seq_charge_hash"] = mod_seq_charge_hash(df["sequence"], mods, df["charge"])

    def calc_isotopes(self, n_isotopes: int = 4) -> None:
        df = self.precursor_df
        comp = chem.peptide_compositions(
            df["sequence"].tolist(),
            df["mods"].tolist() if "mods" in df.columns else None,
        )
        env = chem.isotope_envelopes(comp, k_max=n_isotopes)
        for k in range(n_isotopes):
            df[f"i_{k}"] = env[:, k]

    # ------------------------------------------------------------------
    def append(self, other: "SpecLibBase") -> None:
        """Concatenate another library (fragment rows re-offset)."""
        offset = len(self.fragment_mz_df) if self.fragment_mz_df is not None else 0
        other_prec = other.precursor_df.copy()
        other_prec["frag_start_idx"] = other_prec["frag_start_idx"] + offset
        other_prec["frag_stop_idx"] = other_prec["frag_stop_idx"] + offset
        self.precursor_df = pd.concat(
            [self.precursor_df, other_prec], ignore_index=True
        )
        self.fragment_mz_df = pd.concat(
            [self.fragment_mz_df, other.fragment_mz_df], ignore_index=True
        )
        if self.fragment_intensity_df is not None and other.fragment_intensity_df is not None:
            self.fragment_intensity_df = pd.concat(
                [self.fragment_intensity_df, other.fragment_intensity_df],
                ignore_index=True,
            )

    def copy(self) -> "SpecLibBase":
        return SpecLibBase(
            self.precursor_df.copy(),
            None if self.fragment_mz_df is None else self.fragment_mz_df.copy(),
            None
            if self.fragment_intensity_df is None
            else self.fragment_intensity_df.copy(),
        )

    # ------------------------------------------------------------------
    def save_hdf(self, path: str | Path) -> None:
        import h5py

        with h5py.File(path, "w") as f:
            f.attrs["format"] = "alphadia_tpu_speclib_base"
            _df_to_hdf(f.create_group("precursor_df"), self.precursor_df)
            if self.fragment_mz_df is not None:
                _df_to_hdf(f.create_group("fragment_mz_df"), self.fragment_mz_df)
            if self.fragment_intensity_df is not None:
                _df_to_hdf(
                    f.create_group("fragment_intensity_df"), self.fragment_intensity_df
                )

    @classmethod
    def load_hdf(cls, path: str | Path) -> "SpecLibBase":
        import h5py

        with h5py.File(path, "r") as f:
            prec = _df_from_hdf(f["precursor_df"])
            mz = _df_from_hdf(f["fragment_mz_df"]) if "fragment_mz_df" in f else None
            inten = (
                _df_from_hdf(f["fragment_intensity_df"])
                if "fragment_intensity_df" in f
                else None
            )
        return cls(prec, mz, inten)


class SpecLibFlat:
    """Flat spectral library — the search-engine input."""

    def __init__(self, precursor_df: pd.DataFrame, fragment_df: pd.DataFrame):
        self.precursor_df = precursor_df
        self.fragment_df = fragment_df

    @property
    def n_precursors(self) -> int:
        return len(self.precursor_df)

    def copy(self) -> "SpecLibFlat":
        return SpecLibFlat(self.precursor_df.copy(), self.fragment_df.copy())

    def save_hdf(self, path: str | Path) -> None:
        import h5py

        with h5py.File(path, "w") as f:
            f.attrs["format"] = "alphadia_tpu_speclib_flat"
            _df_to_hdf(f.create_group("precursor_df"), self.precursor_df)
            _df_to_hdf(f.create_group("fragment_df"), self.fragment_df)

    @classmethod
    def load_hdf(cls, path: str | Path) -> "SpecLibFlat":
        import h5py

        with h5py.File(path, "r") as f:
            return cls(_df_from_hdf(f["precursor_df"]), _df_from_hdf(f["fragment_df"]))


# ----------------------------------------------------------------------
def _df_to_hdf(group, df: pd.DataFrame) -> None:
    group.attrs["n_rows"] = len(df)
    group.attrs["columns"] = list(df.columns)
    for col in df.columns:
        vals = df[col].to_numpy()
        if vals.dtype == object:
            vals = vals.astype("S")
        group.create_dataset(str(col), data=vals, compression="gzip", compression_opts=1)


def _df_from_hdf(group) -> pd.DataFrame:
    cols = list(group.attrs["columns"])
    data = {}
    for col in cols:
        vals = group[str(col)][:]
        if vals.dtype.kind == "S":
            vals = vals.astype(str)
        data[col] = vals
    return pd.DataFrame(data)
