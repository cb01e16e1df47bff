"""Transfer library: consensus training data from search results.

(reference: alphadia/outputtransform/outputaccumulator.py:42-497 —
``TransferLearningAccumulator`` + ``AccumulationBroadcaster``: per-run
speclibs rebuilt from psm+frag parquet (targets only, observed >
calibrated > library coordinate preference), accumulated across runs
keeping the top-k runs per precursor by proba, RT renormalized, MS2
quality control by fragment-correlation cutoffs.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from alphadia_tpu.constants.keys import SearchStepFiles
from alphadia_tpu.reporting import logger


def build_run_speclib(
    psm_df: pd.DataFrame, frag_df: pd.DataFrame, run: str
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One run's observed speclib rows (targets only)."""
    psm = psm_df[psm_df["decoy"] == 0].copy() if "decoy" in psm_df else psm_df.copy()
    psm["run"] = run
    # coordinate preference: observed > calibrated > library
    for prop in ("rt", "mz", "mobility"):
        for source in (f"{prop}_observed", f"{prop}_calibrated", f"{prop}_library"):
            if source in psm.columns:
                psm[f"{prop}_obs"] = psm[source]
                break
    frag = frag_df[frag_df["precursor_idx"].isin(psm["precursor_idx"])].copy()
    frag["run"] = run
    return psm, frag


def accumulate_transfer_library(
    folder_list: list[str | Path],
    top_k_samples: int = 3,
    precursor_correlation_cutoff: float = 0.5,
    fragment_correlation_ratio: float = 0.75,
    norm_delta_max: bool = True,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (precursor_df, fragment_df) of the consensus transfer library."""
    psms, frags = [], []
    for folder in folder_list:
        folder = Path(folder)
        psm_path = folder / SearchStepFiles.PSM_FILE_NAME
        frag_path = folder / SearchStepFiles.FRAG_TRANSFER_FILE_NAME
        if not frag_path.exists():
            frag_path = folder / SearchStepFiles.FRAG_FILE_NAME
        if not psm_path.exists() or not frag_path.exists():
            continue
        p, f = build_run_speclib(
            pd.read_parquet(psm_path), pd.read_parquet(frag_path), folder.name
        )
        psms.append(p)
        frags.append(f)
    if not psms:
        return pd.DataFrame(), pd.DataFrame()

    psm = pd.concat(psms, ignore_index=True)
    frag = pd.concat(frags, ignore_index=True)

    # keep top-k runs per precursor by confidence (lowest proba first)
    if "proba" in psm.columns:
        psm = (
            psm.sort_values("proba")
            .groupby("mod_seq_charge_hash" if "mod_seq_charge_hash" in psm else "precursor_idx")
            .head(top_k_samples)
            .reset_index(drop=True)
        )

    # RT normalization to [0, 1] per run (max or delta-max)
    rts = psm["rt_obs"].to_numpy(np.float64)
    norm = np.zeros_like(rts)
    for run, idx in psm.groupby("run").groups.items():
        r = rts[idx]
        if norm_delta_max and len(r) > 2:
            lo, hi = np.percentile(r, [1, 99])
        else:
            lo, hi = r.min(), r.max()
        norm[idx] = np.clip((r - lo) / max(hi - lo, 1e-9), 0, 1)
    psm["rt_norm"] = norm.astype(np.float32)

    # MS2 QC: median fragment correlation per PSM above cutoff; keep
    # fragments with correlation >= ratio * median
    key = ["run", "precursor_idx"]
    med = frag.groupby(key)["correlation"].median().rename("corr_median")
    frag = frag.merge(med, on=key, how="left")
    psm = psm.merge(med, on=key, how="left")
    n_before = len(psm)
    psm = psm[psm["corr_median"] > precursor_correlation_cutoff]
    frag = frag[
        frag["correlation"] >= fragment_correlation_ratio * frag["corr_median"]
    ]
    frag = frag[
        frag.set_index(key).index.isin(psm.set_index(key).index)
    ]
    logger.log(
        25,
        f"Transfer library: {len(psm)} PSMs ({n_before - len(psm)} removed by "
        f"MS2 QC), {len(frag)} fragments",
    )
    return psm.reset_index(drop=True), frag.reset_index(drop=True)
