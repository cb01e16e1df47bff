"""Label-free quantification across runs.

(reference: alphadia/outputtransform/quantification/ — QuantBuilder /
FragmentQuantLoader accumulate per-run ``frag.parquet`` into an ion x run
intensity matrix keyed by the packed ion hash (precursor_idx, number, type,
charge, loss_type), filter ions by cross-run correlation, then run
directLFQ normalization + protein-intensity estimation at the precursor /
peptide / protein-group levels.)

The external directlfq package is not available in this environment; the
`directlfq_style` functions below implement the same two-stage scheme
(sample shift normalization in log space, then per-group ion alignment and
median profile estimation) self-contained in numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.reporting import logger


def ion_hash(precursor_idx, number, ftype, charge, loss_type) -> np.ndarray:
    """Pack ion identity into int64 (reference quant_builder.py:53-81)."""
    return (
        np.asarray(precursor_idx, dtype=np.int64)
        + (np.asarray(number, dtype=np.int64) << 32)
        + (np.asarray(ftype, dtype=np.int64) << 40)
        + (np.asarray(charge, dtype=np.int64) << 48)
        + (np.asarray(loss_type, dtype=np.int64) << 56)
    )


# feature sets matching the reference's loader columns
# (quant_output_builder.py:38-49 QUANTSELECT_COLUMNS / DEFAULT_COLUMNS)
DEFAULT_FEATURES = ("intensity", "correlation")
QUANTSELECT_FEATURES = ("intensity", "correlation", "mass_error", "height")


def accumulate_frag_df(
    run_frames: dict[str, pd.DataFrame],
    columns: tuple[str, ...] = DEFAULT_FEATURES,
) -> dict[str, pd.DataFrame]:
    """Build wide ion x run matrices, one per feature column.

    Returns {feature: DataFrame[ion, precursor_idx, run1, run2, ...]}
    (reference: FragmentQuantLoader.accumulate_from_folders).
    """
    frames: dict[str, list[pd.DataFrame]] = {c: [] for c in columns}
    for run, df in run_frames.items():
        h = ion_hash(
            df["precursor_idx"], df["number"], df["type"], df["charge"], df["loss_type"]
        )
        for c in columns:
            frames[c].append(
                pd.DataFrame(
                    {
                        "ion": h,
                        "precursor_idx": df["precursor_idx"].to_numpy(),
                        run: df[c].to_numpy(),
                    }
                )
                .drop_duplicates("ion")
                .set_index(["ion", "precursor_idx"])[[run]]
            )
    return {
        c: pd.concat(frames[c], axis=1).reset_index() for c in columns
    }


def filter_frag_df(
    intensity_df: pd.DataFrame,
    corr_df: pd.DataFrame,
    min_correlation: float = 0.5,
    top_n: int = 3,
    group_column: str = "precursor_idx",
    group_keys: pd.Series | np.ndarray | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame, np.ndarray]:
    """Keep ions in the top-n by mean correlation within their group, OR
    above min_correlation (reference quant_builder.py:132-183).

    ``group_keys`` overrides ``group_column`` with an externally supplied
    per-row grouping (the reference filters per QUANT LEVEL —
    precursor/peptide/protein group — quant_output_builder.py:243-249).
    Returns (intensity, correlation, keep_mask)."""
    run_cols = [c for c in corr_df.columns if c not in ("ion", group_column, "precursor_idx")]
    mean_corr = corr_df[run_cols].mean(axis=1, skipna=True)
    groups = (
        pd.Series(np.asarray(group_keys), index=corr_df.index)
        if group_keys is not None
        else corr_df[group_column]
    )
    rank = mean_corr.groupby(groups).rank(ascending=False, method="first")
    mask = ((rank <= top_n) | (mean_corr > min_correlation)).to_numpy()
    return intensity_df[mask], corr_df[mask], mask


# ----------------------------------------------------------------------
# directLFQ-style estimation
# ----------------------------------------------------------------------
def normalize_samples(
    log_mat: np.ndarray, num_samples: int | None = None
) -> np.ndarray:
    """Shift each run (column) so pairwise median differences vanish
    (anchor = first column with data).

    ``num_samples`` (search_output.num_samples_quadratic) caps how many
    ions estimate the shifts — the most complete, highest-intensity rows
    — bounding cost on very large matrices.
    """
    est = log_mat
    if num_samples is not None and len(log_mat) > num_samples:
        completeness = np.isfinite(log_mat).sum(axis=1).astype(np.float64)
        completeness += np.nan_to_num(np.nanmean(log_mat, axis=1)) * 1e-6
        top = np.argsort(completeness, kind="stable")[::-1][:num_samples]
        est = log_mat[top]
    n_runs = log_mat.shape[1]
    shifts = np.zeros(n_runs)
    ref = est[:, 0]
    for j in range(1, n_runs):
        both = np.isfinite(ref) & np.isfinite(est[:, j])
        if both.sum() >= 2:
            shifts[j] = np.nanmedian(ref[both] - est[both, j])
    return log_mat + shifts[None, :]


def estimate_group_intensity(log_mat: np.ndarray) -> np.ndarray:
    """Per-run group intensity from an ions x runs log2 matrix.

    Ion offsets (row medians) are removed, the run profile is the column
    median of aligned ions, and the absolute level anchors to the median
    ion level — the directLFQ 'ion trace alignment' scheme.
    """
    if log_mat.size == 0:
        return np.full(log_mat.shape[1], np.nan)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN rows are expected
        row_med = np.nanmedian(log_mat, axis=1, keepdims=True)
        centered = log_mat - row_med
        profile = np.nanmedian(centered, axis=0)
        level = np.nanmedian(row_med)
    return profile + level


def direct_lfq(
    intensity_df: pd.DataFrame,
    group_keys: pd.Series,
    run_columns: list[str],
    normalize: bool = True,
    min_nonnan: int = 1,
    num_samples: int | None = None,
) -> pd.DataFrame:
    """Compute per-group LFQ intensities for every run.

    Parameters
    ----------
    intensity_df : wide ion x run frame (NaN = missing)
    group_keys : group id per ion row (precursor hash / peptide hash / pg)
    num_samples : ion cap for run-shift normalization (see
        :func:`normalize_samples`)
    """
    mat = intensity_df[run_columns].to_numpy(dtype=np.float64).copy()
    mat[mat <= 0] = np.nan
    log_mat = np.log2(mat)
    if normalize and log_mat.shape[1] > 1:
        log_mat = normalize_samples(log_mat, num_samples=num_samples)

    out_rows = []
    keys = group_keys.to_numpy()
    codes, uniques = pd.factorize(group_keys)
    order = np.argsort(codes, kind="stable")
    sorted_keys = keys[order]
    boundaries = np.nonzero(np.diff(codes[order]) != 0)[0] + 1
    starts = np.concatenate([[0], boundaries])
    stops = np.concatenate([boundaries, [len(sorted_keys)]])
    for a, b in zip(starts, stops):
        rows = order[a:b]
        sub = log_mat[rows]
        est = estimate_group_intensity(sub)
        n_ok = np.isfinite(est).sum()
        if n_ok < min_nonnan:
            continue
        out_rows.append([sorted_keys[a], *np.power(2.0, est)])
    out = pd.DataFrame(out_rows, columns=["group", *run_columns])
    logger.info(f"LFQ: quantified {len(out)} groups over {len(run_columns)} runs")
    return out


# ----------------------------------------------------------------------
# QuantSelect-style estimation
# ----------------------------------------------------------------------
def quantselect_ion_scores(
    feature_dfs: dict[str, pd.DataFrame], run_columns: list[str]
) -> np.ndarray:
    """Per-ion quality weight in [0, 1] from the multi-feature matrices.

    Role of the reference's QuantSelect model (quant_builder.py:247-283
    delegates to the external ``quantselect`` package, which scores ions
    from XIC correlation / mass error / intensity features before
    aggregation).  Self-contained scheme here, documented term by term:

    - mean XIC correlation across runs (higher = cleaner elution match)
    - mass-error consistency: 1 / (1 + std_ppm) across runs
    - detection rate: fraction of runs where the ion has signal
    - cross-run stability: 1 / (1 + sd of log2 intensity deviations from
      the ion's run-median profile)

    The four terms are averaged; missing features degrade gracefully to
    the terms that exist.
    """
    n = len(next(iter(feature_dfs.values())))
    terms = []

    if "correlation" in feature_dfs:
        corr = feature_dfs["correlation"][run_columns].to_numpy(np.float64)
        terms.append(np.clip(np.nanmean(corr, axis=1), 0.0, 1.0))

    if "mass_error" in feature_dfs:
        me = feature_dfs["mass_error"][run_columns].to_numpy(np.float64)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            me_std = np.nanstd(me, axis=1)
        me_std = np.where(np.isfinite(me_std), me_std, 5.0)
        terms.append(1.0 / (1.0 + me_std))

    if "intensity" in feature_dfs:
        inten = feature_dfs["intensity"][run_columns].to_numpy(np.float64)
        with np.errstate(invalid="ignore"):
            present = (inten > 0) & np.isfinite(inten)
        terms.append(present.sum(axis=1) / max(len(run_columns), 1))
        log_i = np.where(present, np.log2(np.maximum(inten, 1e-12)), np.nan)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            dev = log_i - np.nanmedian(log_i, axis=1, keepdims=True)
            sd = np.nanstd(dev, axis=1)
        sd = np.where(np.isfinite(sd), sd, 2.0)
        terms.append(1.0 / (1.0 + sd))

    if not terms:
        return np.ones(n)
    return np.clip(np.mean(np.stack(terms, axis=0), axis=0), 1e-3, 1.0)


def _weighted_nanmedian(values: np.ndarray, weights: np.ndarray) -> float:
    ok = np.isfinite(values)
    if not ok.any():
        return np.nan
    v = values[ok]
    w = weights[ok]
    order = np.argsort(v)
    cw = np.cumsum(w[order])
    if cw[-1] <= 0:
        return float(np.median(v))
    idx = np.searchsorted(cw, 0.5 * cw[-1])
    return float(v[order][min(idx, len(v) - 1)])


def quantselect_lfq(
    feature_dfs: dict[str, pd.DataFrame],
    group_keys: pd.Series,
    run_columns: list[str],
    min_nonnan: int = 1,
) -> pd.DataFrame:
    """Feature-weighted group quantification (QuantSelect equivalent).

    Same align-then-profile scheme as ``direct_lfq`` but ions contribute
    with their quality weight: the run profile is the weighted median of
    aligned ion traces, so one noisy ion cannot drag a run's estimate.
    """
    intensity_df = feature_dfs["intensity"]
    weights = quantselect_ion_scores(feature_dfs, run_columns)

    mat = intensity_df[run_columns].to_numpy(dtype=np.float64).copy()
    mat[mat <= 0] = np.nan
    log_mat = np.log2(mat)
    if log_mat.shape[1] > 1:
        log_mat = normalize_samples(log_mat)

    import warnings

    out_rows = []
    keys = group_keys.to_numpy()
    codes, _ = pd.factorize(group_keys)
    order = np.argsort(codes, kind="stable")
    sorted_keys = keys[order]
    boundaries = np.nonzero(np.diff(codes[order]) != 0)[0] + 1
    starts = np.concatenate([[0], boundaries])
    stops = np.concatenate([boundaries, [len(sorted_keys)]])
    for a, b in zip(starts, stops):
        rows = order[a:b]
        sub = log_mat[rows]
        w = weights[rows]
        if sub.size == 0:
            continue
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            row_med = np.nanmedian(sub, axis=1, keepdims=True)
            centered = sub - row_med
            profile = np.array(
                [
                    _weighted_nanmedian(centered[:, j], w)
                    for j in range(centered.shape[1])
                ]
            )
            level = _weighted_nanmedian(row_med[:, 0], w)
        est = profile + level
        if np.isfinite(est).sum() < min_nonnan:
            continue
        out_rows.append([sorted_keys[a], *np.power(2.0, est)])
    out = pd.DataFrame(out_rows, columns=["group", *run_columns])
    logger.info(
        f"QuantSelect LFQ: quantified {len(out)} groups over {len(run_columns)} runs"
    )
    return out
