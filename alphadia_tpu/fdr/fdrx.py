"""Classifier-agnostic target–decoy FDR with PEP estimation.

(reference: alphadia/fdr/_fdrx/{base,stats}.py — ``TargetDecoyFDR`` accepts
any sklearn-style estimator, normalizes q-values by the target/decoy ratio,
supports group competition + fragment competition, and adds a nonparametric
posterior error probability from kernel-smoothed score histograms. Used for
peptide/protein-level FDR experiments on top of the main precursor pipeline.)

The estimator only needs ``fit(X, y)`` and ``predict_proba(X)`` — sklearn
models, our flax ``BinaryClassifier``, or anything duck-typed works.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.fdr.qvalues import fdr_to_q_values, keep_best
from alphadia_tpu.reporting import logger


# NOTE: deliberately NOT unified with qvalues.get_q_values — this function
# mirrors the reference's _fdrx/stats.py semantics exactly (denominator
# `target_cumsum + 1e-6` vs the legacy path's `max(cumsum, 1)`, its sort
# tie-break, r_target_decoy scaling) and is pinned by tests/parity.
def add_q_values(
    df: pd.DataFrame,
    decoy_proba_column: str = "decoy_proba",
    decoy_column: str = "decoy",
    qval_column: str = "qval",
    r_target_decoy: float = 1.0,
) -> pd.DataFrame:
    """q-values from decoy counting, scaled by the pre-competition
    target/decoy ratio (reference _fdrx/stats.py:67-110).

    ``r_target_decoy`` corrects the FDR estimate when the searched decoy
    population is smaller than the target population: with r targets per
    decoy, each observed decoy represents r expected false targets.
    """
    sort_cols = [decoy_proba_column, decoy_column]
    if "precursor_idx" in df.columns:
        sort_cols.append("precursor_idx")  # deterministic tie-break
    df = df.sort_values(sort_cols, ascending=True)
    decoys = df[decoy_column].to_numpy(np.float64)
    fdr = np.cumsum(decoys) / (np.cumsum(1.0 - decoys) + 1e-6)
    df[qval_column] = fdr_to_q_values(fdr) * r_target_decoy
    return df


def get_pep(
    psm_df: pd.DataFrame,
    score_column: str = "decoy_proba",
    decoy_column: str = "decoy",
    score_std: float = 0.01,
    pep_granularity: int = 1000,
    kernel_size: int = 20,
) -> np.ndarray:
    """Nonparametric posterior error probability: decoy density over total
    density of Gaussian-smoothed score histograms (reference
    _fdrx/stats.py:6-64)."""
    score_bins = np.linspace(0, 1, pep_granularity)
    is_decoy = psm_df[decoy_column].to_numpy()
    score = psm_df[score_column].to_numpy()

    target_hist, _ = np.histogram(score[is_decoy == 0], bins=score_bins)
    decoy_hist, _ = np.histogram(score[is_decoy == 1], bins=score_bins)

    std_norm = score_std / (score_bins[1] - score_bins[0])
    kernel = np.exp(
        -(np.arange(-kernel_size, kernel_size + 1) ** 2) / (2 * std_norm**2)
    )
    target_hist = np.convolve(target_hist, kernel, mode="same")
    decoy_hist = np.convolve(decoy_hist, kernel, mode="same")

    pep = decoy_hist / (target_hist + decoy_hist + 1e-6)
    return pep[np.clip(np.digitize(score, score_bins) - 1, 0, len(pep) - 1)]


class TargetDecoyFDR:
    """Semi-supervised FDR estimation over arbitrary identification levels
    (precursors, peptides, proteins) with a pluggable classifier."""

    def __init__(
        self,
        classifier,
        feature_columns: list[str],
        decoy_column: str = "decoy",
        competition_columns: list[str] | None = None,
    ):
        self._classifier = classifier
        self._feature_columns = feature_columns
        self._decoy_column = decoy_column
        self._competition_columns = competition_columns or []

    # ------------------------------------------------------------------
    def fit_classifier(self, psm_df: pd.DataFrame, random_state: int = 0) -> None:
        nan_row = psm_df[self._feature_columns].isna().any(axis=1)
        if nan_row.any():
            logger.info(f"fdrx: removing {int(nan_row.sum())} rows with NaNs")
        X = psm_df.loc[~nan_row, self._feature_columns].to_numpy(np.float32)
        y = psm_df.loc[~nan_row, self._decoy_column].to_numpy(np.float32)

        rng = np.random.default_rng(random_state)
        perm = rng.permutation(len(X))
        n_train = max(1, int(len(X) * 0.8))
        self._classifier.fit(X[perm[:n_train]], y[perm[:n_train]])

    def predict_classifier(self, psm_df: pd.DataFrame) -> np.ndarray:
        """Decoy probability per row; NaN-feature rows get proba 1."""
        nan_row = psm_df[self._feature_columns].isna().any(axis=1).to_numpy()
        X = psm_df.loc[~nan_row, self._feature_columns].to_numpy(np.float32)
        proba = np.ones(len(psm_df))
        if len(X):
            proba[~nan_row] = self._classifier.predict_proba(X)[:, 1]
        return proba

    # ------------------------------------------------------------------
    def predict_qval(
        self,
        psm_df: pd.DataFrame,
        fragments_df: pd.DataFrame | None = None,
        dia_cycle: np.ndarray | None = None,
        competition_heuristic: float = 0.10,
    ) -> pd.DataFrame:
        psm_df = psm_df.copy()
        psm_df["decoy_proba"] = self.predict_classifier(psm_df)

        n_d = int((psm_df[self._decoy_column] == 1).sum())
        r_target_decoy = (
            float((psm_df[self._decoy_column] == 0).sum()) / n_d if n_d else 1.0
        )

        if (
            dia_cycle is not None
            and fragments_df is not None
            and len(fragments_df)
            # same no-mobility gate as fdr/fdr.py: window assignment reads
            # scan 0 of the cycle, which is wrong for timsTOF scan-varying
            # isolation schemes
            and dia_cycle.shape[2] <= 2
        ):
            from alphadia_tpu.fdr.fragcomp import FragmentCompetition

            psm_df = add_q_values(
                psm_df, "decoy_proba", self._decoy_column,
                r_target_decoy=r_target_decoy,
            )
            passing = psm_df[psm_df["qval"] < competition_heuristic]
            # weak batches where nothing clears the heuristic keep the
            # full (uncompeted) table instead of discarding every PSM
            # (mirrors the guard in fdr/fdr.py)
            if len(passing):
                # FragmentCompetition ranks by the canonical 'proba'
                # column (the reference's own fdrx+fragcomp combination
                # crashes here — its fragcomp also sorts by 'proba',
                # which fdrx never creates)
                passing = passing.assign(proba=passing["decoy_proba"])
                psm_df = FragmentCompetition()(
                    passing, fragments_df, dia_cycle
                ).drop(columns=["proba"])

        if self._competition_columns:
            psm_df = keep_best(
                psm_df,
                score_column="decoy_proba",
                group_columns=self._competition_columns,
            )
        psm_df = add_q_values(
            psm_df, "decoy_proba", self._decoy_column, r_target_decoy=r_target_decoy
        )
        psm_df["pep"] = get_pep(
            psm_df, score_column="decoy_proba", decoy_column=self._decoy_column
        )
        return psm_df

    def fit_predict_qval(
        self,
        psm_df: pd.DataFrame,
        fragments_df: pd.DataFrame | None = None,
        cycle: np.ndarray | None = None,
    ) -> pd.DataFrame:
        self.fit_classifier(psm_df)
        return self.predict_qval(psm_df, fragments_df, cycle)
