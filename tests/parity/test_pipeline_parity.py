"""Whole-pipeline reference-oracle parity.

Drives the reference implementation's OWN engine end-to-end — its
``CandidateSelection`` host class + ``_select_candidates_pjit``
(reference: alphadia/search/selection/selection.py:78-737), its
``CandidateScoring`` + ``Candidate.process``
(reference: alphadia/search/scoring/scoring.py:140-661,
containers/candidate.py:40-504) and its ``perform_fdr`` + torch NN
(reference: alphadia/fdr/fdr.py:25-297) — in numba pure-Python mode on a
synthetic run whose raw peak arrays are fed IDENTICALLY to this engine.

Three gates:

1. candidate sets (precursor coverage + rank-0 apex positions) agree;
2. all 46 scoring features, computed by both engines on the REFERENCE's
   candidate set (identical inputs), agree within per-feature tolerances
   — the documented deviations (docs/parity.md "Measured feature-level
   deviations") get explicit looser gates;
3. the final 1%-FDR target ID sets after each side's own full pipeline
   (own candidates -> own features -> own classifier) overlap >= 95%,
   with both FDR legs non-degenerate (decoy PSMs present on both sides).

This converts the function-level parity suite into engine-level parity:
"each function matches" -> "the engine matches".
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from _refload import (
    build_ref_alpharaw,
    patch_fft_numpy,
    patch_scoring_runtime,
    ref_module,
)

from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)

# shared search spec, applied to BOTH engines
RT_TOL = 30.0
MS1_TOL = 15.0
MS2_TOL = 15.0
FWHM_RT = 6.0
SIGMA_SCALE_RT = 0.5
N_CAND = 3
TOP_K_FRAGMENTS = 12
TOP_K_ISOTOPES = 3

# sized so BOTH NN legs actually train: the reference's batching trains
# zero batches below 2x its scaled batch size (classifiers.py:376
# num_batches = n//batch - 1, scaled batch 128), and this engine switches
# to its logistic small-data fallback below 500 PSMs — 600 peptides
# produce ~600 PSMs, clearing both.
WORLD = SyntheticConfig(
    n_peptides=600,
    n_windows=6,
    n_cycles=200,
    seed=17,
    lib_ppm_bias=0.0,  # engine-level parity: no calibration leg
    lib_rt_sigma=4.0,
    fwhm_rt=FWHM_RT,
    # enough chemical noise that DECOYS produce candidates and PSMs: the
    # FDR legs must train on real target/decoy competition, not fall
    # through the no-decoy degenerate path
    noise_peaks_per_spectrum=150,
)


def _ref_compat(df: pd.DataFrame) -> pd.DataFrame:
    """pandas-3 StringDtype -> object for the reference's validators;
    drop ground-truth columns."""
    df = df.drop(columns=[c for c in df.columns if c.startswith("_truth")])
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("str"):
            df[c] = df[c].astype(object)
    return df


@pytest.fixture(scope="module")
def world():
    spectra, prec, frag = make_synthetic_dia(WORLD)
    prec, frag = add_synthetic_decoys(prec, frag)
    return spectra, prec, frag


class _RefDiaData:
    """Minimal DiaData shim around the de-jitted AlphaRawJIT (the real
    wrapper classes need vendor readers; reference alpharaw_wrapper.py
    only contributes `.cycle` + `.to_jitclass()` to the kernels)."""

    def __init__(self, jd):
        self._jd = jd
        self.cycle = jd.cycle
        self.rt_values = jd.rt_values
        self.mobility_values = jd.mobility_values
        self.has_mobility = False
        self.scan_max_index = jd.scan_max_index

    def to_jitclass(self):
        return self._jd


@pytest.fixture(scope="module")
def ref_results(world):
    """Run the reference engine: selection -> scoring -> FDR."""
    spectra, prec, frag = world
    prec_ref = _ref_compat(prec)
    frag_ref = _ref_compat(frag)

    sel_mod = ref_module("alphadia.search.selection.selection")
    patch_fft_numpy(sel_mod)
    config_df = ref_module("alphadia.search.selection.config_df")
    sel_cfg = config_df.CandidateSelectionConfig()
    sel_cfg.update(
        dict(
            rt_tolerance=RT_TOL,
            precursor_mz_tolerance=MS1_TOL,
            fragment_mz_tolerance=MS2_TOL,
            candidate_count=N_CAND,
            top_k_fragments=TOP_K_FRAGMENTS,
            exclude_shared_ions=True,
            kernel_size=30,
            sigma_scale_rt=SIGMA_SCALE_RT,
            use_weighted_score=False,
        )
    )
    dia = _RefDiaData(build_ref_alpharaw(spectra))
    candidates = sel_mod.CandidateSelection(
        dia,
        prec_ref,
        frag_ref,
        sel_cfg,
        rt_column="rt_library",
        mobility_column="mobility_library",
        precursor_mz_column="mz_library",
        fragment_mz_column="mz_library",
        fwhm_rt=FWHM_RT,
        fwhm_mobility=0.012,
    )(thread_count=1)

    sc_mod = ref_module("alphadia.search.scoring.scoring")
    patch_scoring_runtime(ref_module("alphadia.search.scoring.utils"))
    sc_cfg = ref_module("alphadia.search.scoring.config").CandidateScoringConfig()
    sc_cfg.update(
        dict(
            top_k_fragments=TOP_K_FRAGMENTS,
            top_k_isotopes=TOP_K_ISOTOPES,
            exclude_shared_ions=True,
            precursor_mz_tolerance=MS1_TOL,
            fragment_mz_tolerance=MS2_TOL,
            quant_window=3,
            quant_all=True,
            experimental_xic=True,
        )
    )
    features, _frag_features = sc_mod.CandidateScoring(
        dia_data=dia,
        precursors_flat=prec_ref,
        fragments_flat=frag_ref,
        rt_column="rt_library",
        mobility_column="mobility_library",
        precursor_mz_column="mz_library",
        fragment_mz_column="mz_library",
        config=sc_cfg,
    )(candidates, thread_count=1)

    # reference FDR: its torch NN on its 67-column feature list
    import torch

    torch.manual_seed(42)
    ref_fdr = ref_module("alphadia.fdr.fdr")
    ref_cls = ref_module("alphadia.fdr.classifiers")
    wf_utils = ref_module("alphadia.workflow.peptidecentric.utils")
    # production defaults: enable_nn_hyperparameter_tuning: true scales
    # (batch, lr) to the PSM count — without it batch 5000 > n means ZERO
    # training batches and the ID set is random-init luck
    classifier = ref_cls.BinaryClassifierLegacyNewBatching(
        test_size=0.001,
        batch_size=5000,
        learning_rate=0.001,
        epochs=10,
        experimental_hyperparameter_tuning=True,
    )
    available = [c for c in wf_utils.feature_columns if c in features.columns]
    psm = ref_fdr.perform_fdr(
        classifier,
        available,
        features[features["decoy"] == 0].copy(),
        features[features["decoy"] == 1].copy(),
        competitive=True,
        group_channels=True,
        random_state=42,
    )
    n_decoy_psm = int((features["decoy"] == 1).sum())
    ids = set(
        psm[(psm["qval"] <= 0.01) & (psm["decoy"] == 0)]["precursor_idx"].astype(int)
    )
    return dict(
        candidates=candidates, features=features, ids=ids, n_decoy_psm=n_decoy_psm
    )


@pytest.fixture(scope="module")
def tpu_results(world):
    """Run this engine: selection -> scoring -> FDR on the same arrays."""
    spectra, prec, frag = world
    from alphadia_tpu.fdr.fdr import perform_fdr
    from alphadia_tpu.models.classifier import BinaryClassifier
    from alphadia_tpu.rawdata.diadata import DiaData
    from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig
    from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
    from alphadia_tpu.workflow.peptidecentric.peptidecentric import (
        FDR_FEATURE_COLUMNS,
    )

    dia = DiaData.from_spectra(spectra)
    candidates = CandidateSelection(
        dia,
        prec,
        frag,
        SelectionConfig(
            rt_tolerance=RT_TOL,
            precursor_mz_tolerance=MS1_TOL,
            fragment_mz_tolerance=MS2_TOL,
            candidate_count=N_CAND,
            top_k_fragments=TOP_K_FRAGMENTS,
            fwhm_rt=FWHM_RT,
            sigma_scale_rt=SIGMA_SCALE_RT,
            batch_size=1024,  # one static batch -> one CPU compile
        ),
        rt_column="rt_library",
        precursor_mz_column="mz_library",
        fragment_mz_column="mz_library",
    )()

    scoring = CandidateScoring(
        dia,
        prec,
        frag,
        ScoringConfig(
            precursor_mz_tolerance=MS1_TOL,
            fragment_mz_tolerance=MS2_TOL,
            top_k_fragments=TOP_K_FRAGMENTS,
            top_k_isotopes=TOP_K_ISOTOPES,
            batch_size=2048,
        ),
        rt_column="rt_library",
        precursor_mz_column="mz_library",
        fragment_mz_column="mz_library",
    )
    features, _frag_df = scoring(candidates)

    classifier = BinaryClassifier(
        test_size=0.001,
        batch_size=5000,
        learning_rate=0.001,
        epochs=10,
        experimental_hyperparameter_tuning=True,
        random_state=42,
    )
    available = [c for c in FDR_FEATURE_COLUMNS if c in features.columns]
    psm = perform_fdr(
        classifier,
        available,
        features[features["decoy"] == 0].copy(),
        features[features["decoy"] == 1].copy(),
        competitive=True,
        group_channels=True,
        random_state=42,
    )
    n_decoy_psm = int((features["decoy"] == 1).sum())
    ids = set(
        psm[(psm["qval"] <= 0.01) & (psm["decoy"] == 0)]["precursor_idx"].astype(int)
    )
    return dict(
        scoring=scoring,
        candidates=candidates,
        features=features,
        ids=ids,
        n_decoy_psm=n_decoy_psm,
    )


# ----------------------------------------------------------------------
def test_candidate_sets_match(ref_results, tpu_results, world):
    _, prec, _ = world
    n_slots = WORLD.n_windows + 1
    ref_cand = ref_results["candidates"]
    our_cand = tpu_results["candidates"]

    ref_set = set(ref_cand["precursor_idx"].astype(int))
    our_set = set(our_cand["precursor_idx"].astype(int))
    jaccard = len(ref_set & our_set) / len(ref_set | our_set)
    assert jaccard >= 0.90, f"candidate precursor-set jaccard {jaccard:.3f}"

    # rank-0 apex agreement (reference frames are spectrum indices)
    r0_ref = (
        ref_cand[ref_cand["rank"] == 0]
        .set_index("precursor_idx")["frame_center"]
        // n_slots
    )
    r0_our = our_cand[our_cand["rank"] == 0].set_index("precursor_idx")[
        "frame_center"
    ]
    common = r0_ref.index.intersection(r0_our.index)
    assert len(common) > 300
    within3 = ((r0_ref.loc[common] - r0_our.loc[common]).abs() <= 3).mean()
    assert within3 >= 0.85, f"rank-0 apex within 3 cycles: {within3:.3f}"


# per-feature gates: (median relative deviation, pearson corr) on the
# reference's own candidates scored by both engines. Tolerances are 2x the
# measured round-3 values (docs/parity.md "Measured feature-level
# deviations"); features under a documented convention deviation carry
# their explicit budget.
FEATURE_GATES = {
    "base_width_rt": (0.05, 0.999),  # exclusive-stop cycle span vs rt[stop-1]
    "rt_observed": (0.001, 0.999),
    "mono_ms1_intensity": (0.52, 0.999),  # ref double-counts the dummy scan row
    "top_ms1_intensity": (0.52, 0.999),
    "sum_ms1_intensity": (0.52, 0.999),
    "weighted_ms1_intensity": (0.52, 0.999),
    # r4: reference-exact weighting (tile(shape) centers, dummy-scan
    # distance terms, obs-merge /(count+1e-6)) + delta-space ppm math
    "weighted_mass_deviation": (0.08, 0.99),
    "weighted_mass_error": (0.08, 0.99),
    "mz_observed": (0.001, 0.999),
    "mono_ms1_height": (0.01, 0.999),
    "top_ms1_height": (0.01, 0.999),
    "sum_ms1_height": (0.01, 0.999),
    "weighted_ms1_height": (0.01, 0.999),
    "isotope_intensity_correlation": (0.02, 0.99),
    "isotope_height_correlation": (0.02, 0.99),
    "n_observations": (0.02, None),  # observation cap (max_ms2_obs) differs
    "height_correlation": (0.02, 0.99),
    "intensity_fraction": (0.02, 0.9),
    "intensity_fraction_weighted": (0.02, 0.9),
    "mean_observation_score": (0.02, 0.9),
    "sum_b_ion_intensity": (0.15, 0.95),  # quant-window area conventions
    "sum_y_ion_intensity": (0.15, 0.95),
    "diff_b_y_ion_intensity": (0.02, 0.9),
    "f_masked": (0.01, 0.999),
    "fragment_frame_correlation": (0.01, 0.98),
    "top3_frame_correlation": (0.01, 0.98),
    "template_frame_correlation": (0.05, 0.99),
    "top3_b_ion_correlation": (0.01, 0.95),
    "n_b_ions": (0.001, 0.999),
    "top3_y_ion_correlation": (0.01, 0.95),
    "n_y_ions": (0.001, 0.999),
    "cycle_fwhm": (0.05, 0.99),  # cycle_time/n_slots rt-width residual
    "delta_frame_peak": (0.01, 0.95),
    "top_3_ms2_mass_error": (0.02, 0.99),  # r4 delta-space ppm math
    "mean_ms2_mass_error": (0.02, 0.99),
    "n_overlapping": (0.001, 0.999),
    "mean_overlapping_intensity": (0.52, 0.999),  # dummy-scan 2x again
    "mean_overlapping_mass_error": (0.02, 0.99),
}


def test_feature_parity_on_reference_candidates(ref_results, tpu_results, world):
    """Score the REFERENCE's candidate set with OUR kernel and compare all
    46 features per (precursor, rank)."""
    n_slots = WORLD.n_windows + 1
    ref_cand = ref_results["candidates"]
    conv = pd.DataFrame(
        {
            "precursor_idx": ref_cand["precursor_idx"].to_numpy(),
            "rank": ref_cand["rank"].to_numpy(),
            "score": ref_cand["score"].to_numpy(),
            "frame_center": ref_cand["frame_center"].to_numpy() // n_slots,
            "frame_start": ref_cand["frame_start"].to_numpy() // n_slots,
            "frame_stop": ref_cand["frame_stop"].to_numpy() // n_slots,
            "scan_center": 0,
            "scan_start": 0,
            "scan_stop": 1,
        }
    )
    ours, _ = tpu_results["scoring"](conv)

    m = ref_results["features"].merge(
        ours, on=["precursor_idx", "rank"], suffixes=("_ref", "_tpu")
    )
    assert len(m) > 200, f"only {len(m)} shared scored candidates"

    failures = []
    measured = {}
    for name, (med_tol, corr_tol) in FEATURE_GATES.items():
        a = m[f"{name}_ref"].to_numpy(np.float64)
        b = m[f"{name}_tpu"].to_numpy(np.float64)
        ok = np.isfinite(a) & np.isfinite(b)
        a, b = a[ok], b[ok]
        denom = np.maximum(np.maximum(np.abs(a), np.abs(b)), 1e-6)
        med = float(np.median(np.abs(a - b) / denom))
        r = (
            float(np.corrcoef(a, b)[0, 1])
            if a.std() > 0 and b.std() > 0
            else float("nan")
        )
        measured[name] = (med, r)
        if med > med_tol:
            failures.append(f"{name}: median rel dev {med:.4f} > {med_tol}")
        if corr_tol is not None and np.isfinite(r) and r < corr_tol:
            failures.append(f"{name}: corr {r:.4f} < {corr_tol}")
    if os.environ.get("PARITY_DUMP"):
        with open(os.environ["PARITY_DUMP"], "w") as fh:
            json.dump(
                {k: {"median_rel_dev": v[0], "corr": v[1]} for k, v in measured.items()},
                fh,
                indent=1,
            )

    # regression gate vs the committed measurement (docs/parity_features.json):
    # feature drift fails loudly instead of silently consuming gate headroom.
    # Refresh with PARITY_REFRESH=1 after an intentional kernel change.
    committed_path = Path(__file__).parents[2] / "docs" / "parity_features.json"
    if os.environ.get("PARITY_REFRESH"):
        committed_path.write_text(
            json.dumps(
                {k: {"median_rel_dev": v[0], "corr": v[1]} for k, v in measured.items()},
                indent=1,
            )
        )
    else:
        committed = json.loads(committed_path.read_text())
        assert set(committed) == set(measured), (
            "feature set drifted vs docs/parity_features.json — "
            "rerun with PARITY_REFRESH=1"
        )
        for name, rec in committed.items():
            med, r = measured[name]
            med_cap = max(2.0 * rec["median_rel_dev"], rec["median_rel_dev"] + 0.005)
            if med > med_cap:
                failures.append(
                    f"{name}: med rel dev {med:.4f} drifted past committed "
                    f"{rec['median_rel_dev']:.4f} (cap {med_cap:.4f})"
                )
            if np.isfinite(r) and np.isfinite(rec["corr"]) and r < rec["corr"] - 0.02:
                failures.append(
                    f"{name}: corr {r:.4f} drifted below committed {rec['corr']:.4f} - 0.02"
                )
    assert not failures, "feature parity regressions:\n" + "\n".join(failures)


def test_id_sets_overlap_at_1pct_fdr(ref_results, tpu_results, world):
    _, prec, _ = world
    ref_ids, our_ids = ref_results["ids"], tpu_results["ids"]

    # both FDR legs must be non-degenerate: decoys reached scoring
    assert ref_results["n_decoy_psm"] >= 10, "reference FDR leg degenerate"
    assert tpu_results["n_decoy_psm"] >= 10, "tpu FDR leg degenerate"
    assert len(ref_ids) >= 150 and len(our_ids) >= 150

    overlap = len(ref_ids & our_ids) / max(len(ref_ids), len(our_ids))
    assert overlap >= 0.95, (
        f"1%-FDR ID overlap {overlap:.3f} "
        f"(ref={len(ref_ids)}, tpu={len(our_ids)}, "
        f"shared={len(ref_ids & our_ids)})"
    )

    # both engines identify almost exclusively planted peptides
    truth = prec.set_index("precursor_idx")["_truth_detectable"]
    for label, ids in (("ref", ref_ids), ("tpu", our_ids)):
        tp = float(np.mean([bool(truth.loc[p]) for p in ids]))
        assert tp >= 0.95, f"{label} true-positive rate {tp:.3f}"
