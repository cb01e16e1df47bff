"""Target–decoy q-value computation.

(reference: alphadia/fdr/fdr.py:150-297 — get_q_values / keep_best /
_fdr_to_q_values; semantics preserved exactly: sort by (score, decoy,
tie-break columns) ascending, FDR = cumulative decoys / cumulative targets,
q-value = reverse running minimum.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def fdr_to_q_values(fdr_values: np.ndarray) -> np.ndarray:
    """Reverse running minimum of an (ascending-sorted by score) FDR array."""
    return np.flip(np.minimum.accumulate(np.flip(fdr_values)))


def get_q_values(
    df: pd.DataFrame,
    score_column: str = "proba",
    decoy_column: str = "_decoy",
    qval_column: str = "qval",
    extra_sort_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Add q-values; lower score = better (proba of being decoy)."""
    if extra_sort_columns is None:
        extra_sort_columns = ["precursor_idx"]
    extra = [c for c in extra_sort_columns if c in df.columns]
    df = df.sort_values([score_column, decoy_column, *extra], ascending=True)
    decoys = df[decoy_column].to_numpy(dtype=np.float64)
    decoy_cumsum = np.cumsum(decoys)
    target_cumsum = np.cumsum(1.0 - decoys)
    with np.errstate(divide="ignore", invalid="ignore"):
        fdr_values = decoy_cumsum / np.maximum(target_cumsum, 1.0)
    df[qval_column] = fdr_to_q_values(fdr_values)
    return df


def keep_best(
    df: pd.DataFrame,
    score_column: str = "proba",
    group_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Keep the best (lowest score) PSM per group."""
    if group_columns is None:
        group_columns = ["channel", "precursor_idx"]
    group_columns = [c for c in group_columns if c in df.columns]
    df = df.reset_index(drop=True)
    df = df.sort_values([score_column, *group_columns], ascending=True)
    df = df.groupby(group_columns).head(1)
    return df.sort_index().reset_index(drop=True)
