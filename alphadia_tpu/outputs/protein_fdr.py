"""Protein-group level FDR.

(reference: alphadia/outputtransform/protein_fdr.py:15-147 — per-group
features (counts, peptide/precursor/run counts, best/mean/worst PSM score)
-> sklearn MLPClassifier -> q-values normalized by target/decoy ratio.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from sklearn.neural_network import MLPClassifier
from sklearn.preprocessing import StandardScaler

from alphadia_tpu.exceptions import TooFewProteinsError
from alphadia_tpu.fdr.qvalues import get_q_values
from alphadia_tpu.reporting import logger

FEATURE_COLUMNS = [
    "count",
    "mean_score",
    "n_peptides",
    "n_precursor",
    "n_runs",
    "best_score",
    "worst_score",
]


def perform_protein_fdr(psm_df: pd.DataFrame, figure_path=None) -> pd.DataFrame:
    rows = []
    for _, group in psm_df.groupby(["pg", "decoy"]):
        rows.append(
            {
                "pg": group["pg"].iloc[0],
                "genes": group["genes"].iloc[0] if "genes" in group else "",
                "proteins": group["proteins"].iloc[0] if "proteins" in group else "",
                "decoy": group["decoy"].iloc[0],
                "count": len(group),
                "n_precursor": group["precursor_idx"].nunique(),
                "n_peptides": group["sequence"].nunique()
                if "sequence" in group
                else group["precursor_idx"].nunique(),
                "n_runs": group["run"].nunique() if "run" in group else 1,
                "mean_score": group["proba"].mean(),
                "best_score": group["proba"].min(),
                "worst_score": group["proba"].max(),
            }
        )
    features = pd.DataFrame(rows)
    n_targets = int((features["decoy"] == 0).sum())
    n_decoys = int((features["decoy"] == 1).sum())
    if n_targets < 2 or n_decoys < 2:
        raise TooFewProteinsError()

    X = features[FEATURE_COLUMNS].to_numpy()
    y = features["decoy"].to_numpy()

    rng = np.random.default_rng(42)
    perm = rng.permutation(len(X))
    train = perm[: max(int(len(X) * 0.8), 2)]

    scaler = StandardScaler()
    X_train = scaler.fit_transform(X[train])
    X_all = scaler.transform(X)
    clf = MLPClassifier(random_state=0, max_iter=300).fit(X_train, y[train])
    features["proba"] = clf.predict_proba(X_all)[:, 1]

    features = get_q_values(
        features,
        score_column="proba",
        decoy_column="decoy",
        qval_column="pg_qval",
        extra_sort_columns=["pg"],
    )
    logger.info(
        f"Protein FDR: {n_targets:,} target and {n_decoys:,} decoy protein groups"
    )
    features["pg_qval"] = features["pg_qval"] * n_targets / max(n_decoys, 1)

    out = []
    for decoy in (0, 1):
        out.append(
            psm_df[psm_df["decoy"] == decoy].merge(
                features[features["decoy"] == decoy][["pg", "pg_qval"]],
                on="pg",
                how="left",
            )
        )
    return pd.concat(out, ignore_index=True)
