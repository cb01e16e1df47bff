"""Spectral library loaders: TSV/CSV transition lists and HDF.

(reference: alphadia/libtransform/loader.py:13 ``DynamicLoader`` via
alphabase readers)

Supported inputs:
- our own HDF (written by SpecLibBase/SpecLibFlat.save_hdf);
- alphabase-layout HDF (column groups under ``library/``), best effort;
- long-format TSV/CSV transition lists (DIA-NN / Spectronaut style column
  names), assembled into a hierarchical SpecLibBase without recomputing any
  masses — file values are authoritative.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from alphadia_tpu.library.pipeline import ProcessingStep
from alphadia_tpu.library.speclib import SpecLibBase, SpecLibFlat, _df_from_hdf
from alphadia_tpu.reporting import logger

# UniMod accession -> name, from the generated common-mods table
# (constants/unimod_common.tsv via chem.py)
from alphadia_tpu.library.chem import UNIMOD_ID_TO_NAME as _UNIMOD_NAMES

# column aliases in long-format transition lists
_PRECURSOR_ALIASES = {
    "modified_sequence": ["ModifiedPeptide", "ModifiedSequence", "ModifiedPeptideSequence", "modified_sequence", "FullUniModPeptideName"],
    "sequence": ["StrippedPeptide", "PeptideSequence", "Stripped.Sequence", "sequence", "naked_sequence"],
    "charge": ["PrecursorCharge", "Charge", "charge", "Precursor.Charge"],
    "precursor_mz": ["PrecursorMz", "Q1", "precursor_mz", "Precursor.Mz"],
    "rt": ["Tr_recalibrated", "iRT", "RT", "RetentionTime", "NormalizedRetentionTime", "rt", "irt"],
    "mobility": ["IonMobility", "PrecursorIonMobility", "mobility", "IM"],
    "proteins": ["ProteinGroups", "ProteinName", "UniprotID", "Protein.Ids", "proteins", "ProteinId"],
    "genes": ["Genes", "GeneName", "genes", "Gene.Names"],
}
_FRAGMENT_ALIASES = {
    "frag_mz": ["FragmentMz", "ProductMz", "Q3", "fragment_mz", "Product.Mz"],
    "frag_intensity": ["RelativeIntensity", "LibraryIntensity", "RelativeFragmentIntensity", "intensity", "Relative.Intensity"],
    "frag_type": ["FragmentType", "FragmentIonType", "frag_type", "Fragment.Type"],
    "frag_charge": ["FragmentCharge", "FragmentIonCharge", "frag_charge", "Fragment.Charge"],
    "frag_number": ["FragmentSeriesNumber", "FragmentNumber", "frag_number", "Fragment.Series.Number"],
}


def _find_col(df: pd.DataFrame, aliases: list[str]) -> str | None:
    for a in aliases:
        if a in df.columns:
            return a
    return None


def _parse_modified_sequence(modseq: str) -> tuple[str, str, str]:
    """'_AC(UniMod:4)DEK_' or 'AC[Carbamidomethyl (C)]DEK' -> (seq, mods, sites)."""
    s = str(modseq).strip("_")
    seq_chars: list[str] = []
    mods: list[str] = []
    sites: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c in "([":
            close = {"(": ")", "[": "]"}[c]
            depth = 1
            j = i + 1
            while j < len(s) and depth:
                if s[j] == c:
                    depth += 1
                elif s[j] == close:
                    depth -= 1
                j += 1
            token = s[i + 1 : j - 1]
            name = None
            low = token.lower().replace(" ", "")
            if low.startswith("unimod:"):
                uid = int(low.split(":")[1])
                name = _UNIMOD_NAMES.get(uid, f"UniMod:{uid}")
            else:
                name = token.split(" (")[0].split("(")[0].strip()
            pos = len(seq_chars)
            site_aa = seq_chars[-1] if seq_chars else "Any_N-term"
            mods.append(f"{name}@{site_aa if pos else 'Any_N-term'}")
            sites.append(str(pos if pos else 0))
            i = j
        else:
            seq_chars.append(c)
            i += 1
    return "".join(seq_chars), ";".join(mods), ";".join(sites)


def load_speclib_tsv(path: str | Path) -> SpecLibBase:
    sep = "," if str(path).lower().endswith(".csv") else "\t"
    df = pd.read_csv(path, sep=sep)

    cols = {k: _find_col(df, v) for k, v in _PRECURSOR_ALIASES.items()}
    fcols = {k: _find_col(df, v) for k, v in _FRAGMENT_ALIASES.items()}
    if cols["charge"] is None or fcols["frag_mz"] is None:
        raise ValueError(f"Unrecognized transition list format: {list(df.columns)[:20]}")

    modseq_col = cols["modified_sequence"] or cols["sequence"]
    df["_key"] = df[modseq_col].astype(str) + "/" + df[cols["charge"]].astype(str)

    prec_rows = []
    frag_type_codes = df[fcols["frag_type"]].astype(str).str[0].str.lower() if fcols["frag_type"] else "y"
    frag_charges = df[fcols["frag_charge"]].astype(int) if fcols["frag_charge"] else 1

    max_fz = int(np.clip(frag_charges.max() if hasattr(frag_charges, "max") else 1, 1, 2))
    types = sorted(set(frag_type_codes)) if hasattr(frag_type_codes, "__iter__") else ["y"]
    types = [t for t in types if t in "abcxyz"] or ["b", "y"]
    col_names = [f"{t}_z{z}" for t in types for z in range(1, max_fz + 1)]
    col_of = {c: j for j, c in enumerate(col_names)}

    groups = df.groupby("_key", sort=False)
    total_sites = 0
    seqs = []
    for key, g in groups:
        if cols["sequence"]:
            seq = str(g[cols["sequence"]].iloc[0])
        else:
            seq, _, _ = _parse_modified_sequence(g[modseq_col].iloc[0])
        seqs.append(seq)
        total_sites += max(len(seq) - 1, 1)

    mz_mat = np.zeros((total_sites, len(col_names)), dtype=np.float32)
    int_mat = np.zeros((total_sites, len(col_names)), dtype=np.float32)
    cursor = 0
    for (key, g), seq in zip(groups, seqs):
        if cols["modified_sequence"]:
            _, mods, sites = _parse_modified_sequence(g[modseq_col].iloc[0])
        else:
            mods, sites = "", ""
        naa = len(seq)
        n_sites = max(naa - 1, 1)
        prec_rows.append(
            {
                "sequence": seq,
                "mods": mods,
                "mod_sites": sites,
                "charge": np.uint8(g[cols["charge"]].iloc[0]),
                "precursor_mz": np.float32(g[cols["precursor_mz"]].iloc[0]) if cols["precursor_mz"] else np.float32(0),
                "rt": np.float32(g[cols["rt"]].iloc[0]) if cols["rt"] else np.float32(0),
                "mobility": np.float32(g[cols["mobility"]].iloc[0]) if cols["mobility"] else np.float32(0),
                "proteins": str(g[cols["proteins"]].iloc[0]) if cols["proteins"] else "",
                "genes": str(g[cols["genes"]].iloc[0]) if cols["genes"] else "",
                "frag_start_idx": np.uint32(cursor),
                "frag_stop_idx": np.uint32(cursor + n_sites),
                "nAA": np.uint8(naa),
            }
        )
        for _, row in g.iterrows():
            t = str(row[fcols["frag_type"]])[0].lower() if fcols["frag_type"] else "y"
            z = int(row[fcols["frag_charge"]]) if fcols["frag_charge"] else 1
            num = int(row[fcols["frag_number"]]) if fcols["frag_number"] else 1
            cname = f"{t}_z{z}"
            if cname not in col_of:
                continue
            pos = num - 1 if t in "abc" else naa - 1 - num
            if not (0 <= pos < n_sites):
                continue
            mz_mat[cursor + pos, col_of[cname]] = row[fcols["frag_mz"]]
            if fcols["frag_intensity"]:
                int_mat[cursor + pos, col_of[cname]] = row[fcols["frag_intensity"]]
            else:
                int_mat[cursor + pos, col_of[cname]] = 1.0
        cursor += n_sites

    precursor_df = pd.DataFrame(prec_rows)
    lib = SpecLibBase(
        precursor_df,
        pd.DataFrame(mz_mat, columns=col_names),
        pd.DataFrame(int_mat, columns=col_names),
    )
    logger.info(f"Loaded {len(precursor_df)} precursors from {path}")
    return lib


def load_speclib_hdf(path: str | Path):
    """Load our HDF formats; fall back to alphabase-layout groups."""
    import h5py

    with h5py.File(path, "r") as f:
        fmt = f.attrs.get("format", "")
        if fmt == "alphadia_tpu_speclib_base":
            return SpecLibBase.load_hdf(path)
        if fmt == "alphadia_tpu_speclib_flat":
            return SpecLibFlat.load_hdf(path)
        # alphabase layout: <root or 'library'>/precursor_df etc.
        root = f["library"] if "library" in f else f
        if "precursor_df" in root:
            prec = _hdf_group_to_df(root["precursor_df"])
            mz = _hdf_group_to_df(root["fragment_mz_df"]) if "fragment_mz_df" in root else None
            inten = (
                _hdf_group_to_df(root["fragment_intensity_df"])
                if "fragment_intensity_df" in root
                else None
            )
            return SpecLibBase(prec, mz, inten)
    raise ValueError(f"Unrecognized speclib HDF layout in {path}")


def _hdf_group_to_df(group) -> pd.DataFrame:
    if "columns" in group.attrs:
        return _df_from_hdf(group)
    data = {}
    for k in group:
        try:
            vals = group[k][:]
        except Exception:
            continue
        if getattr(vals, "ndim", 1) == 1:
            if vals.dtype.kind == "S":
                vals = vals.astype(str)
            data[k] = vals
    return pd.DataFrame(data)


class DynamicLoader(ProcessingStep):
    """Extension-dispatch library loader."""

    def validate(self, input_) -> bool:
        return isinstance(input_, (str, Path)) and Path(input_).exists()

    def forward(self, path):
        suffix = Path(path).suffix.lower()
        if suffix in (".hdf", ".hdf5", ".h5"):
            return load_speclib_hdf(path)
        if suffix in (".tsv", ".csv", ".txt"):
            return load_speclib_tsv(path)
        raise ValueError(f"Unsupported library format {suffix}")
