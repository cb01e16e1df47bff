"""Per-run spectral library initialization.

(reference: alphadia/workflow/peptidecentric/library_init.py:9-81 —
normalize library RT onto the run gradient, filter precursors to the
observable quadrupole m/z range, optional channel filter.)
"""

from __future__ import annotations

import numpy as np

from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.reporting import logger


def norm_to_rt(dia_rt_values: np.ndarray, norm_values: np.ndarray) -> np.ndarray:
    """Map (any-scale) library RT values onto the run gradient."""
    norm_values = np.asarray(norm_values, dtype=np.float64)
    lo, hi = norm_values.min(), norm_values.max()
    if hi - lo <= 0:
        normed = np.zeros_like(norm_values)
    else:
        normed = (norm_values - lo) / (hi - lo)
    return np.interp(normed, [0, 1], [dia_rt_values[0], dia_rt_values[-1]])


def init_spectral_library(
    dia_cycle: np.ndarray,
    dia_rt_values: np.ndarray,
    spectral_library: SpecLibFlat,
    channel_filter: str = "",
) -> SpecLibFlat:
    """Returns a new SpecLibFlat restricted to observable precursors with
    run-normalized RT. Keeps the unfiltered df for multiplex requant."""
    prec = spectral_library.precursor_df.copy()
    prec["rt_library"] = norm_to_rt(
        dia_rt_values, prec["rt_library"].to_numpy()
    ).astype(np.float32)

    lower = dia_cycle[dia_cycle > 0].min()
    upper = dia_cycle[dia_cycle > 0].max()
    n_before = int((prec["decoy"] == 0).sum())
    mask = (prec["mz_library"] >= lower) & (prec["mz_library"] <= upper)

    if channel_filter:
        channels = [int(c) for c in str(channel_filter).split(",")]
        mask &= prec["channel"].isin(channels)

    from alphadia_tpu.workflow.optimizers.optimization_lock import subset_flat_library

    out = subset_flat_library(prec, spectral_library.fragment_df, mask.to_numpy())
    # the unfiltered frames travel together: precursor_df_unfiltered's
    # flat_frag_* indices point into the ORIGINAL fragment table, not the
    # compacted one (multiplex requant re-subsets from these)
    out.precursor_df_unfiltered = prec
    out.fragment_df_unfiltered = spectral_library.fragment_df
    n_after = int((out.precursor_df["decoy"] == 0).sum())
    logger.log(
        25,
        f"Library init: {n_after:,} target precursors observable "
        f"({n_before - n_after:,} removed)",
    )
    return out
