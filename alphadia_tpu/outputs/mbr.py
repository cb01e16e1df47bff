"""Match-between-runs library builder.

Behavioral contract (reference: alphadia/libtransform/mbr.py:100-214
``MbrLibraryBuilder``):

- keep PSMs at qval <= fdr (targets define the retained elution groups);
- per-precursor RT = median observed RT grouped by mod_seq_charge_hash,
  falling back to the elution-group median;
- proteins/genes columns are replaced by the inferred protein group;
- fragments come from the base library rows of each retained precursor;
- decoys optionally retained.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.reporting import logger
from alphadia_tpu.workflow.optimizers.optimization_lock import subset_flat_library


class MbrLibraryBuilder:
    """Note a deliberate deviation: the reference drops decoys by default and
    regenerates them when the MBR library is loaded (possible on hierarchical
    libraries); this build keeps the decoy siblings of retained elution
    groups instead, because flat libraries cannot regenerate decoys."""

    def __init__(self, fdr: float = 0.01, keep_decoys: bool = True):
        self.fdr = fdr
        self.keep_decoys = keep_decoys

    def __call__(
        self, psm_df: pd.DataFrame, base_library: SpecLibFlat
    ) -> SpecLibFlat:
        psm = psm_df[psm_df["qval"] <= self.fdr] if "qval" in psm_df else psm_df
        targets = psm[psm["decoy"] == 0] if "decoy" in psm else psm

        if "mod_seq_charge_hash" in targets.columns:
            rt_by_hash = targets.groupby("mod_seq_charge_hash")["rt_observed"].median()
        else:
            rt_by_hash = pd.Series(dtype=np.float32)
        rt_by_eg = (
            targets.groupby("elution_group_idx")["rt_observed"].median()
            if "elution_group_idx" in targets.columns
            else pd.Series(dtype=np.float32)
        )
        pg_by_eg = (
            targets.groupby("elution_group_idx")["pg"].first()
            if "pg" in targets.columns
            else pd.Series(dtype=object)
        )

        prec = base_library.precursor_df
        keep_eg = set(targets["elution_group_idx"].unique())
        mask = prec["elution_group_idx"].isin(keep_eg).to_numpy()
        if not self.keep_decoys:
            # pandas may hand out a read-only view: no in-place &=
            mask = mask & (prec["decoy"] == 0).to_numpy()
        lib = subset_flat_library(prec, base_library.fragment_df, mask)
        out = lib.precursor_df

        rt = np.full(len(out), np.nan, np.float32)
        if len(rt_by_hash) and "mod_seq_charge_hash" in out.columns:
            rt = rt_by_hash.reindex(out["mod_seq_charge_hash"]).to_numpy(np.float32)
        fallback = rt_by_eg.reindex(out["elution_group_idx"]).to_numpy(np.float32)
        rt = np.where(np.isnan(rt), fallback, rt)
        out["rt_library"] = np.where(
            np.isnan(rt), out["rt_library"].to_numpy(np.float32), rt
        )

        if len(pg_by_eg):
            pg = pg_by_eg.reindex(out["elution_group_idx"])
            for col in ("proteins", "genes"):
                if col in out.columns:
                    out[col] = np.where(pg.notna(), pg.astype(str), out[col])

        logger.log(
            25,
            f"MBR library: {len(out)} precursors from "
            f"{len(keep_eg)} confident elution groups",
        )
        return SpecLibFlat(out, lib.fragment_df)
