"""Train and package a default FDR classifier warm start.

NOTE: not shipped by default. A warm start only helps when trained on
feature distributions matching real acquisitions; a synthetic-noise-trained
classifier measurably hurt unrelated runs (biased init + small fine-tune
batches cannot escape it). Re-enable by running this script against
representative real search features.

(reference ships constants/classifier/fa9945ae23db872d.pth keyed by the
xxhash of its feature-column set; this script produces the analogous
packaged state for this engine's feature set from a synthetic search.)

Run: python scripts/train_default_classifier.py
"""

import pickle
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

from alphadia_tpu.models.classifier import BinaryClassifier
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig
from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)
from alphadia_tpu.workflow.managers.fdr_manager import FDRManager
from alphadia_tpu.workflow.peptidecentric.peptidecentric import FDR_FEATURE_COLUMNS


def main() -> None:
    features = []
    for seed in (7, 17, 27):
        spectra, prec, frag = make_synthetic_dia(
            SyntheticConfig(
                n_peptides=600,
                n_windows=8,
                n_cycles=500,
                noise_peaks_per_spectrum=300,
                seed=seed,
            )
        )
        prec, frag = add_synthetic_decoys(prec, frag, seed=seed + 1)
        dia = DiaData.from_spectra(spectra)
        cands = CandidateSelection(
            dia, prec, frag, SelectionConfig(rt_tolerance=45.0, fragment_mz_tolerance=25.0, batch_size=1024)
        )()
        psm, _ = CandidateScoring(dia, prec, frag, ScoringConfig(fragment_mz_tolerance=25.0, batch_size=1024))(cands)
        features.append(psm)
        print(f"seed {seed}: {len(psm)} scored candidates")

    import pandas as pd

    df = pd.concat(features, ignore_index=True)
    manager = FDRManager(feature_columns=FDR_FEATURE_COLUMNS)
    available = [c for c in FDR_FEATURE_COLUMNS if c in df.columns]
    X = df[available].to_numpy(np.float32)
    y = df["decoy"].to_numpy(np.float32)
    clf = BinaryClassifier(random_state=0, epochs=20)
    clf.fit(np.nan_to_num(X), y)
    proba = clf.predict_proba(np.nan_to_num(X))[:, 1]
    sep = proba[y == 1].mean() - proba[y == 0].mean()
    print(f"trained on {len(X)} PSMs ({int(y.sum())} decoys); separation {sep:.3f}")

    out = (
        Path(__file__).parents[1]
        / "alphadia_tpu"
        / "constants"
        / "classifier"
        / f"{manager.feature_hash()}.pkl"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(clf.to_state_dict(), f)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
