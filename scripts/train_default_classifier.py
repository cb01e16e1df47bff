"""Train and package the default FDR classifier warm start.

(reference ships constants/classifier/fa9945ae23db872d.pth keyed by the
xxhash of its feature-column set — fdr_manager.py:296-321; this script
produces the analogous packaged state for this engine's feature set.)

Round-1 lesson: a warm start trained on a NARROW synthetic corpus hurt
unrelated runs (biased init + small fine-tune batches cannot escape it).
This version therefore (a) trains across a widely varied corpus — window
counts, noise levels, mass biases and spreads, RT widths, detectability,
intensity scales, including a 4D mobility run — so the classifier learns
feature<->decoy structure rather than corpus-specific offsets, and (b)
GATES packaging on a held-out experiment: the artifact is only written if
warm-starting improves (or matches) first-iteration IDs at 1% FDR on two
corpora with unseen parameter combinations.

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

# training corpora: deliberately spread over acquisition/library regimes
TRAIN_CORPORA = [
    dict(seed=7, n_windows=8, n_cycles=500, noise_peaks_per_spectrum=300),
    dict(seed=17, n_windows=4, n_cycles=350, noise_peaks_per_spectrum=100,
         fwhm_rt=3.0, lib_rt_sigma=4.0),
    dict(seed=27, n_windows=16, n_cycles=700, noise_peaks_per_spectrum=500,
         fwhm_rt=12.0, lib_rt_sigma=20.0, cycle_time=2.5),
    dict(seed=37, n_windows=8, n_cycles=500, noise_peaks_per_spectrum=250,
         lib_ppm_bias=-6.0, peak_ppm_sigma=5.0),
    dict(seed=47, n_windows=12, n_cycles=450, noise_peaks_per_spectrum=400,
         detectable_fraction=0.5, base_intensity=2e3),
    dict(seed=57, n_windows=6, n_cycles=400, noise_peaks_per_spectrum=150,
         lib_ppm_bias=0.0, base_intensity=5e4, detectable_fraction=0.9),
    dict(seed=67, n_windows=8, n_cycles=500, noise_peaks_per_spectrum=300,
         with_mobility=True),
]

# held-out gate: parameter combos NOT in the training sweep
EVAL_CORPORA = [
    dict(seed=101, n_windows=10, n_cycles=550, noise_peaks_per_spectrum=350,
         fwhm_rt=8.0, lib_ppm_bias=2.5, detectable_fraction=0.7),
    dict(seed=113, n_windows=5, n_cycles=300, noise_peaks_per_spectrum=200,
         fwhm_rt=4.5, lib_ppm_bias=-3.0, peak_ppm_sigma=3.5,
         base_intensity=8e3),
]


def _search(corpus: dict, n_peptides=600):
    cfg = SyntheticConfig(n_peptides=n_peptides, **corpus)
    spectra, prec, frag = make_synthetic_dia(cfg)
    prec, frag = add_synthetic_decoys(prec, frag, seed=cfg.seed + 1)
    dia = DiaData.from_spectra(spectra)
    cands = CandidateSelection(
        dia, prec, frag,
        SelectionConfig(rt_tolerance=45.0, fragment_mz_tolerance=25.0, batch_size=1024),
    )()
    psm, _ = CandidateScoring(
        dia, prec, frag, ScoringConfig(fragment_mz_tolerance=25.0, batch_size=1024)
    )(cands)
    return psm


def _first_iteration_ids(psm, warm_state: dict | None, seed: int) -> int:
    """IDs at 1% FDR after ONE fit on a small first-optimization-style
    subset, warm-started from `warm_state` when given (mimics
    FDRManager._get_classifier + fit_predict)."""
    from alphadia_tpu.fdr.fdr import perform_fdr

    rng = np.random.default_rng(seed)
    sub = psm.sample(n=min(2500, len(psm)), random_state=seed).reset_index(drop=True)
    if warm_state is not None:
        clf = BinaryClassifier.from_state_dict(warm_state)
        clf.random_state = 0
    else:
        clf = BinaryClassifier(random_state=0)
    available = [c for c in FDR_FEATURE_COLUMNS if c in sub.columns]
    out = perform_fdr(
        clf,
        available,
        sub[sub["decoy"] == 0].copy(),
        sub[sub["decoy"] == 1].copy(),
        competitive=True,
        random_state=int(rng.integers(0, 2**31)),
    )
    return int(((out["qval"] < 0.01) & (out["decoy"] == 0)).sum())


def main() -> None:
    import pandas as pd

    features = []
    for corpus in TRAIN_CORPORA:
        psm = _search(corpus)
        features.append(psm)
        print(f"corpus {corpus['seed']}: {len(psm)} scored candidates")

    df = pd.concat(features, ignore_index=True)
    manager = FDRManager(feature_columns=FDR_FEATURE_COLUMNS)
    available = [c for c in FDR_FEATURE_COLUMNS if c in df.columns]
    X = np.nan_to_num(df[available].to_numpy(np.float32))
    y = df["decoy"].to_numpy(np.float32)
    clf = BinaryClassifier(random_state=0, epochs=20)
    clf.fit(X, y)
    proba = clf.predict_proba(X)[:, 1]
    sep = proba[y == 1].mean() - proba[y == 0].mean()
    print(f"trained on {len(X)} PSMs ({int(y.sum())} decoys); separation {sep:.3f}")
    state = clf.to_state_dict()

    # held-out gate: warm start must not lose IDs on unseen corpora
    gains = []
    for corpus in EVAL_CORPORA:
        psm = _search(corpus)
        warm = _first_iteration_ids(psm, state, seed=corpus["seed"])
        cold = _first_iteration_ids(psm, None, seed=corpus["seed"])
        print(f"eval {corpus['seed']}: warm {warm} vs cold {cold} IDs @1% FDR")
        gains.append(warm - cold)

    if sum(gains) < 0:
        print("warm start LOSES IDs on held-out corpora — NOT packaging")
        sys.exit(1)

    out = (
        Path(__file__).parents[1]
        / "alphadia_tpu"
        / "constants"
        / "classifier"
        / f"{manager.feature_hash()}.pkl"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(state, f)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
