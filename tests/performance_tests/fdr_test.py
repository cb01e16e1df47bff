"""FDR classifier performance test — timing + discrimination quality.

(reference analog: tests/performance_tests/fdr_test.py — times the
target/decoy classifier over stored PSM features downloaded from a
datashare; this environment has no network, so the feature matrix comes
from a full synthetic search: the same 46-feature scoring kernel over a
physics-grounded synthetic run, which gives realistic feature
distributions and correlations.)

Ad-hoc, not CI-gated (same as the reference). Prints one JSON line per
iteration plus a summary.

Run: python tests/performance_tests/fdr_test.py [--size PCT] [--n-iter N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))


def build_features(size_pct: int):
    """Run selection+scoring over a synthetic DIA run; return (X, y)."""
    import numpy as np

    from alphadia_tpu.rawdata import DiaData
    from alphadia_tpu.search.scoring import (
        FEATURE_COLUMNS,
        CandidateScoring,
        ScoringConfig,
    )
    from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
    from alphadia_tpu.testing.synthetic import (
        SyntheticConfig,
        add_synthetic_decoys,
        make_synthetic_dia,
    )

    n_pep = max(int(3000 * size_pct / 100), 200)
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=n_pep, n_windows=8, n_cycles=400, seed=17)
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    dia = DiaData.from_spectra(spectra)
    cands = CandidateSelection(
        dia, prec, frag, SelectionConfig(rt_tolerance=60.0, candidate_count=2)
    )()
    psm, _ = CandidateScoring(
        dia, prec, frag, ScoringConfig(collect_fragments=False)
    )(cands)
    X = psm[FEATURE_COLUMNS].to_numpy(np.float32)
    y = psm["decoy"].to_numpy()
    return X, y


def main():
    parser = argparse.ArgumentParser(description="FDR classifier perf test")
    parser.add_argument("--size", type=int, default=100, help="test size in percent")
    parser.add_argument("--n-iter", type=int, default=5)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from alphadia_tpu.models.classifier import BinaryClassifier

    t0 = time.time()
    X, y = build_features(args.size)
    print(
        json.dumps(
            {
                "event": "features",
                "n_psm": len(X),
                "n_features": X.shape[1],
                "decoy_fraction": round(float(y.mean()), 3),
                "build_s": round(time.time() - t0, 2),
            }
        )
    )

    fit_times, pred_times, aucs = [], [], []
    for it in range(args.n_iter):
        clf = BinaryClassifier(random_state=it)
        t0 = time.time()
        clf.fit(X, y)
        fit_s = time.time() - t0
        t0 = time.time()
        proba = clf.predict_proba(X)[:, 1]
        pred_s = time.time() - t0
        # rank-based AUC (decoys should score high)
        order = np.argsort(proba)
        ranks = np.empty(len(proba))
        ranks[order] = np.arange(len(proba))
        n1, n0 = int(y.sum()), int((1 - y).sum())
        auc = (ranks[y == 1].sum() - n1 * (n1 - 1) / 2) / max(n1 * n0, 1)
        fit_times.append(fit_s)
        pred_times.append(pred_s)
        aucs.append(auc)
        print(
            json.dumps(
                {
                    "event": "iter",
                    "i": it,
                    "fit_s": round(fit_s, 3),
                    "predict_s": round(pred_s, 3),
                    "auc": round(float(auc), 4),
                }
            )
        )

    print(
        json.dumps(
            {
                "event": "summary",
                "fit_s_median": round(float(np.median(fit_times)), 3),
                "predict_s_median": round(float(np.median(pred_times)), 3),
                "auc_mean": round(float(np.mean(aucs)), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
