"""FDR orchestration: classifier fit, q-values, competition.

(reference: alphadia/fdr/fdr.py:25-297 ``perform_fdr`` — same flow:
80/20 train split -> fit NN -> proba -> q-values -> optional fragment
competition below the 10% heuristic -> competitive best-per-group ->
recompute q-values.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.fdr.fragcomp import FragmentCompetition
from alphadia_tpu.fdr.qvalues import get_q_values, keep_best
from alphadia_tpu.reporting import logger

# below this many PSMs the NN is replaced by balanced logistic regression
MIN_PSM_FOR_NN = 500


def perform_fdr(
    classifier,
    available_columns: list[str],
    df_target: pd.DataFrame,
    df_decoy: pd.DataFrame,
    *,
    competitive: bool = False,
    group_channels: bool = True,
    df_fragments: pd.DataFrame | None = None,
    dia_cycle: np.ndarray | None = None,
    fdr_heuristic: float = 0.1,
    random_state: int | None = None,
    figure_path: str | None = None,
) -> pd.DataFrame:
    """Returns the PSM df with `proba` and `qval` columns added."""
    df_target = df_target.dropna(subset=available_columns)
    df_decoy = df_decoy.dropna(subset=available_columns)

    # decoy-counting q-values stay valid under moderate imbalance (real
    # searches routinely score 2-3x more target than decoy PSMs); warn
    # only at extreme skew, where CLASSIFIER training can degrade — a 10%
    # threshold fired on nearly every production optimization iteration
    n_t, n_d = len(df_target), len(df_decoy)
    if n_t + n_d and (n_t > 3 * max(n_d, 1) or n_d > 3 * max(n_t, 1)):
        logger.warning(
            f"FDR: extreme target/decoy imbalance ({n_t} vs {n_d}); "
            f"classifier ranking may degrade"
        )

    X = np.concatenate(
        [
            df_target[available_columns].to_numpy(np.float32),
            df_decoy[available_columns].to_numpy(np.float32),
        ]
    )
    y = np.concatenate([np.zeros(n_t), np.ones(n_d)]).astype(np.float32)

    psm_df = pd.concat([df_target, df_decoy], ignore_index=True)
    psm_df["_decoy"] = y

    # the NN needs enough examples of BOTH classes to rank stably; on small
    # or heavily imbalanced batches (synthetic tests, first optimization
    # batches at tight tolerances) its output oscillates step to step.
    # Balanced logistic regression is the stable small-data estimator, and
    # it fits with as little as one decoy example — the decoy-counting
    # q-values stay honest regardless of how few decoys there are (a search
    # so clean that decoys yield no candidates has a low FDR estimate, not
    # an unknowable one).
    too_small = len(X) < MIN_PSM_FOR_NN
    too_few_decoys = n_d < max(50, 0.02 * n_t)
    if n_t == 0:
        psm_df["qval"] = 1.0
        psm_df["proba"] = 1.0
        psm_df.attrs["fdr_estimator"] = "no_target"
        return psm_df
    if (too_small or too_few_decoys) and n_d >= 1:
        logger.warning(
            f"FDR: {n_d} decoys vs {n_t} targets — too few to train the NN; "
            "using balanced logistic regression for q-value estimation"
        )
        from sklearn.linear_model import LogisticRegression

        mu = X.mean(axis=0)
        sd = X.std(axis=0) + 1e-9
        Xz = np.nan_to_num((X - mu) / sd, nan=0.0, posinf=0.0, neginf=0.0)
        lr = LogisticRegression(
            class_weight="balanced", max_iter=1000, random_state=random_state or 0
        )
        lr.fit(Xz, y)
        psm_df["proba"] = lr.predict_proba(Xz)[:, 1]
        estimator = "logistic"
    elif n_d == 0:
        logger.warning(
            f"FDR: no decoy PSMs among {n_t} candidates; decoy-counting "
            "q-values are 0 by construction"
        )
        psm_df["proba"] = 0.0
        estimator = "no_decoy"
    else:
        rng = np.random.default_rng(random_state)
        perm = rng.permutation(len(X))
        n_train = int(len(X) * 0.8)
        train_idx = perm[:n_train]
        classifier.fit(X[train_idx], y[train_idx])

        psm_df["proba"] = classifier.predict_proba(X)[:, 1]
        estimator = "nn"
    psm_df = get_q_values(psm_df, "proba", "_decoy")

    group_columns = (
        (["elution_group_idx", "channel"] if group_channels else ["elution_group_idx"])
        if competitive
        else ["precursor_idx"]
    )

    if (
        df_fragments is not None
        and len(df_fragments)
        and dia_cycle is not None
        and dia_cycle.shape[2] <= 2
    ):
        start_idx = psm_df["qval"].searchsorted(fdr_heuristic, side="left")
        if start_idx == 0:
            start_idx = len(psm_df)
        competition = FragmentCompetition()
        psm_df = competition(psm_df.iloc[:start_idx], df_fragments, dia_cycle)

    psm_df = keep_best(psm_df, group_columns=group_columns)
    psm_df = get_q_values(psm_df, "proba", "_decoy")

    if figure_path is not None:
        _plot_fdr(psm_df, figure_path)

    # which estimator actually ranked the PSMs (read by callers/tests;
    # set last because pandas ops above do not propagate .attrs reliably)
    psm_df.attrs["fdr_estimator"] = estimator
    return psm_df


def _plot_fdr(psm_df: pd.DataFrame, figure_path: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
        t = psm_df[psm_df["_decoy"] == 0]["proba"]
        d = psm_df[psm_df["_decoy"] == 1]["proba"]
        axes[0].hist([t, d], bins=50, label=["target", "decoy"], histtype="step")
        axes[0].set_xlabel("proba")
        axes[0].legend()
        qv = np.sort(psm_df[psm_df["_decoy"] == 0]["qval"].to_numpy())
        axes[1].plot(qv, np.arange(len(qv)))
        axes[1].set_xlim(0, 0.05)
        axes[1].set_xlabel("q-value")
        axes[1].set_ylabel("# targets")
        fig.tight_layout()
        fig.savefig(figure_path, dpi=120)
        plt.close(fig)
    except Exception as e:  # pragma: no cover
        logger.warning(f"could not plot FDR figure: {e}")
