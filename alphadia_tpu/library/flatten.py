"""Flatten a hierarchical library into the search input format.

(reference: alphadia/libtransform/flatten.py:15-111 — FlattenLibrary /
InitFlatColumns / LogFlatLibraryStats; fragment cardinality per
alphabase.peptide.fragment.calc_fragment_cardinality)

Keeps the top-k most intense fragments per precursor above a minimum
intensity; emits the canonical flat fragment columns (mz_library f32,
intensity f32, cardinality u8, type u8, loss_type u8, charge u8, number u8,
position u8) sorted by m/z within each precursor block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.library.pipeline import ProcessingStep
from alphadia_tpu.library.speclib import SpecLibBase, SpecLibFlat
from alphadia_tpu.reporting import logger


class FlattenLibrary(ProcessingStep):
    def __init__(self, top_k_fragments: int = 12, min_fragment_intensity: float = 0.01):
        self.top_k_fragments = top_k_fragments
        self.min_fragment_intensity = min_fragment_intensity

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibBase) and input_.fragment_mz_df is not None

    def forward(self, lib: SpecLibBase) -> SpecLibFlat:
        prec = lib.precursor_df.reset_index(drop=True)
        cols = lib.charged_frag_types
        mz_mat = lib.fragment_mz_df.to_numpy(dtype=np.float32)
        if lib.fragment_intensity_df is not None:
            int_mat = lib.fragment_intensity_df.to_numpy(dtype=np.float32)
        else:
            int_mat = np.ones_like(mz_mat)

        type_code = np.array([ord(c.split("_z")[0][0]) for c in cols], dtype=np.uint8)
        frag_charge = np.array([int(c.split("_z")[1]) for c in cols], dtype=np.uint8)
        is_nterm = np.array(
            [c.split("_z")[0][0] in "abc" for c in cols], dtype=bool
        )

        starts = prec["frag_start_idx"].to_numpy()
        stops = prec["frag_stop_idx"].to_numpy()
        naa = prec["nAA"].to_numpy()

        out_mz, out_int, out_type, out_charge = [], [], [], []
        out_number, out_position = [], []
        flat_start = np.zeros(len(prec), dtype=np.uint32)
        flat_stop = np.zeros(len(prec), dtype=np.uint32)
        cursor = 0
        for i in range(len(prec)):
            a, b = starts[i], stops[i]
            mz = mz_mat[a:b]  # [n_sites, n_cols]
            inten = int_mat[a:b]
            n_sites = b - a
            pos = np.repeat(np.arange(n_sites, dtype=np.int32), len(cols))
            mzf = mz.ravel()
            intf = inten.ravel()
            typef = np.tile(type_code, n_sites)
            chargef = np.tile(frag_charge, n_sites)
            ntermf = np.tile(is_nterm, n_sites)
            number = np.where(ntermf, pos + 1, naa[i] - 1 - pos)

            mmax = intf.max() if len(intf) else 0.0
            keep = (mzf > 10.0) & (
                intf >= self.min_fragment_intensity * max(mmax, 1e-12)
            )
            idx = np.nonzero(keep)[0]
            if len(idx) > self.top_k_fragments:
                top = np.argsort(intf[idx], kind="stable")[::-1][: self.top_k_fragments]
                idx = idx[top]
            idx = idx[np.argsort(mzf[idx], kind="stable")]

            flat_start[i] = cursor
            cursor += len(idx)
            flat_stop[i] = cursor
            out_mz.append(mzf[idx])
            out_int.append(intf[idx])
            out_type.append(typef[idx])
            out_charge.append(chargef[idx])
            out_number.append(number[idx])
            out_position.append(pos[idx])

        fragment_df = pd.DataFrame(
            {
                "mz_library": np.concatenate(out_mz) if out_mz else np.zeros(0, np.float32),
                "intensity": np.concatenate(out_int) if out_int else np.zeros(0, np.float32),
                "cardinality": np.ones(cursor, dtype=np.uint8),
                "type": np.concatenate(out_type) if out_type else np.zeros(0, np.uint8),
                "loss_type": np.zeros(cursor, dtype=np.uint8),
                "charge": np.concatenate(out_charge) if out_charge else np.zeros(0, np.uint8),
                "number": np.concatenate(out_number).astype(np.uint8)
                if out_number
                else np.zeros(0, np.uint8),
                "position": np.concatenate(out_position).astype(np.uint8)
                if out_position
                else np.zeros(0, np.uint8),
            }
        )

        prec = prec.copy()
        prec["flat_frag_start_idx"] = flat_start
        prec["flat_frag_stop_idx"] = flat_stop
        flat = SpecLibFlat(prec, fragment_df)
        _compute_cardinality(flat)
        return flat


def _compute_cardinality(flat: SpecLibFlat) -> None:
    """cardinality = number of precursors in the same elution group sharing
    a fragment m/z (quantized to 1e-4)."""
    prec = flat.precursor_df
    frag = flat.fragment_df
    if "elution_group_idx" not in prec.columns or len(frag) == 0:
        return
    n_frag = len(frag)
    eg_of_frag = np.zeros(n_frag, dtype=np.int64)
    for eg, a, b in zip(
        prec["elution_group_idx"], prec["flat_frag_start_idx"], prec["flat_frag_stop_idx"]
    ):
        eg_of_frag[a:b] = eg
    key = eg_of_frag * (1 << 32) + np.round(
        frag["mz_library"].to_numpy() * 1e4
    ).astype(np.int64) % (1 << 32)
    _, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    frag["cardinality"] = np.minimum(counts[inv], 255).astype(np.uint8)


class InitFlatColumns(ProcessingStep):
    """Rename the first matching coordinate columns to the canonical
    `*_library` names (reference InitFlatColumns)."""

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibFlat)

    def forward(self, flat: SpecLibFlat) -> SpecLibFlat:
        precursor_map = {
            "mz_library": ["mz_library", "mz", "precursor_mz"],
            "rt_library": ["rt_library", "rt", "rt_norm", "rt_pred", "rt_norm_pred", "irt"],
            "mobility_library": ["mobility_library", "mobility", "mobility_pred"],
        }
        fragment_map = {"mz_library": ["mz_library", "mz", "predicted_mz"]}
        for mapping, df in ((precursor_map, flat.precursor_df), (fragment_map, flat.fragment_df)):
            for target, candidates in mapping.items():
                for c in candidates:
                    if c in df.columns:
                        if c != target:
                            df.rename(columns={c: target}, inplace=True)
                        break
        if "mobility_library" not in flat.precursor_df.columns:
            flat.precursor_df["mobility_library"] = np.float32(0)
            logger.warning("Library contains no ion mobility annotations")
        return flat


class LogFlatLibraryStats(ProcessingStep):
    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibFlat)

    def forward(self, flat: SpecLibFlat) -> SpecLibFlat:
        df = flat.precursor_df
        logger.info("============ Library Stats ============")
        logger.info(f"Number of precursors: {len(df):,}")
        if "decoy" in df.columns:
            logger.info(f"\tthereof targets: {(df['decoy'] == 0).sum():,}")
            logger.info(f"\tthereof decoys: {(df['decoy'] == 1).sum():,}")
        if "elution_group_idx" in df.columns:
            n_eg = df["elution_group_idx"].nunique()
            logger.info(f"Number of elution groups: {n_eg:,}")
        return flat
