"""Numeric parity against the reference implementation itself.

Each test runs a reference alphaDIA function (pure-Python via the numba
stub in ``_refload.py``) and this engine's counterpart on identical
inputs and diffs the outputs.  This is the external ground truth the
synthetic self-tests cannot provide: a shared wrong assumption between
our kernels and our test oracles would still fail here.
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from _refload import ref_module  # noqa: E402


# ----------------------------------------------------------------------
# q-values + target/decoy competition  (reference alphadia/fdr/fdr.py)
# ----------------------------------------------------------------------
def _psm_frame(n=400, seed=0):
    rng = np.random.default_rng(seed)
    decoy = rng.integers(0, 2, n)
    proba = np.clip(rng.normal(0.35 + 0.3 * decoy, 0.2), 0, 1)
    df = pd.DataFrame(
        {
            "proba": proba,
            "_decoy": decoy,
            "precursor_idx": rng.permutation(n),
            "channel": rng.integers(0, 2, n),
        }
    )
    # pin the best-scoring row to a target: the reference's raw
    # decoys/targets ratio is +inf while targets==0, our implementation
    # clamps the denominator — identical everywhere after the first target
    best = df["proba"].idxmin()
    df.loc[best, "_decoy"] = 0
    return df


def test_q_values_match_reference():
    ref_fdr = ref_module("alphadia.fdr.fdr")
    from alphadia_tpu.fdr.qvalues import get_q_values

    df = _psm_frame()
    with np.errstate(divide="ignore", invalid="ignore"):
        ref = ref_fdr.get_q_values(df.copy(), "proba", "_decoy")
    ours = get_q_values(df.copy(), "proba", "_decoy")
    ref = ref.sort_values("precursor_idx").reset_index(drop=True)
    ours = ours.sort_values("precursor_idx").reset_index(drop=True)
    np.testing.assert_allclose(
        ours["qval"].to_numpy(), ref["qval"].to_numpy(), rtol=0, atol=0
    )


def test_fdr_to_q_values_matches_reference():
    ref_fdr = ref_module("alphadia.fdr.fdr")
    from alphadia_tpu.fdr.qvalues import fdr_to_q_values

    fdr_vals = np.abs(np.random.default_rng(1).normal(0.1, 0.1, 200))
    np.testing.assert_array_equal(
        fdr_to_q_values(fdr_vals), ref_fdr._fdr_to_q_values(fdr_vals)
    )


def test_keep_best_matches_reference():
    ref_fdr = ref_module("alphadia.fdr.fdr")
    from alphadia_tpu.fdr.qvalues import keep_best

    rng = np.random.default_rng(2)
    n = 300
    df = pd.DataFrame(
        {
            "proba": rng.random(n).round(2),  # rounding forces ties
            "precursor_idx": rng.integers(0, 60, n),
            "channel": rng.integers(0, 2, n),
        }
    )
    ref = ref_fdr.keep_best(df.copy(), "proba", ["channel", "precursor_idx"])
    ours = keep_best(df.copy(), "proba", ["channel", "precursor_idx"])
    pd.testing.assert_frame_equal(
        ours.reset_index(drop=True), ref.reset_index(drop=True)
    )


# ----------------------------------------------------------------------
# protein grouping  (reference alphadia/outputtransform/grouping.py)
# ----------------------------------------------------------------------
TAXONOMY = {
    "distinct": ["A", "A", "B", "B"],
    "differentiable": ["A", "A;B", "A;B", "B"],
    "indistinguishable": ["A;B", "A;B", "A;B", "A;B"],
    "subset": ["A", "A;B", "A;B", "A"],
    "subsumable": ["A", "A;B", "B;C", "C"],
    "shared_only": ["A;B", "A;B", "B;C", "B;C"],
    "circular": ["A;B", "B;C", "A;C"],
    "complex": ["A;B", "A;B;C", "B;C;D", "D"],
}


@pytest.mark.parametrize("name", sorted(TAXONOMY))
def test_grouping_matches_reference_taxonomy(name):
    ref_grouping = ref_module("alphadia.outputtransform.grouping")
    from alphadia_tpu.outputs.grouping import perform_grouping

    prots = TAXONOMY[name]
    df = pd.DataFrame(
        {
            "precursor_idx": np.arange(len(prots)),
            "proteins": prots,
            "decoy": 0,
        }
    )
    ref = (
        ref_grouping.perform_grouping(df.copy(), "proteins")
        .sort_values("precursor_idx")
        .reset_index(drop=True)
    )
    ours = (
        perform_grouping(df.copy(), "proteins")
        .sort_values("precursor_idx")
        .reset_index(drop=True)
    )
    assert list(ours["pg_master"]) == list(ref["pg_master"]), name
    assert list(ours["pg"]) == list(ref["pg"]), name


def test_grouping_matches_reference_randomized():
    ref_grouping = ref_module("alphadia.outputtransform.grouping")
    from alphadia_tpu.outputs.grouping import perform_grouping

    rng = np.random.default_rng(5)
    for trial in range(8):
        n_prot, n_pep = 8, 40
        prots = []
        for _ in range(n_pep):
            k = rng.integers(1, 4)
            ids = sorted(rng.choice(n_prot, size=k, replace=False))
            prots.append(";".join(f"P{i}" for i in ids))
        df = pd.DataFrame(
            {
                "precursor_idx": np.arange(n_pep),
                "proteins": prots,
                "decoy": rng.integers(0, 2, n_pep),
            }
        )
        ref = (
            ref_grouping.perform_grouping(df.copy(), "proteins")
            .sort_values("precursor_idx")
            .reset_index(drop=True)
        )
        ours = (
            perform_grouping(df.copy(), "proteins")
            .sort_values("precursor_idx")
            .reset_index(drop=True)
        )
        assert list(ours["pg_master"]) == list(ref["pg_master"]), f"trial {trial}"
        assert list(ours["pg"]) == list(ref["pg"]), f"trial {trial}"


# ----------------------------------------------------------------------
# LOESS calibration model  (reference alphadia/calibration/models.py)
# ----------------------------------------------------------------------
def test_loess_matches_reference_on_smooth_data():
    ref_models = ref_module("alphadia.calibration.models")
    from alphadia_tpu.calibration.models import LOESSRegression

    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(0, 100, 600))
    y = 2.0 + 0.5 * x - 0.003 * x**2 + rng.normal(0, 0.05, x.shape)

    ref = ref_models.LOESSRegression(n_kernels=6, polynomial_degree=2).fit(x, y)
    ours = LOESSRegression(n_kernels=6, polynomial_degree=2).fit(x, y)

    grid = np.linspace(5, 95, 200)
    ref_pred = ref.predict(grid)
    our_pred = ours.predict(grid)
    # different kernel blending internals; both must recover the smooth
    # curve to well under the noise level
    span = y.max() - y.min()
    assert np.max(np.abs(our_pred - ref_pred.ravel())) < 0.01 * span


def test_loess_small_sample_fallbacks_match_reference():
    """Both implementations degrade to fewer kernels / lower degree on
    tiny inputs rather than failing."""
    ref_models = ref_module("alphadia.calibration.models")
    from alphadia_tpu.calibration.models import LOESSRegression

    rng = np.random.default_rng(8)
    x = np.sort(rng.uniform(0, 10, 12))
    y = 1.0 + 0.3 * x + rng.normal(0, 0.01, x.shape)
    ref_pred = ref_models.LOESSRegression(n_kernels=6, polynomial_degree=2).fit(
        x, y
    ).predict(x)
    our_pred = LOESSRegression(n_kernels=6, polynomial_degree=2).fit(x, y).predict(x)
    span = y.max() - y.min()
    # interior only: at n=12 both models run their small-sample fallback
    # and the open-ended edge kernels extrapolate differently by design
    inner = slice(1, -1)
    assert np.max(np.abs(our_pred[inner] - ref_pred.ravel()[inner])) < 0.05 * span


# ----------------------------------------------------------------------
# quadrupole transmission  (reference alphadia/search/scoring/quadrupole.py)
# ----------------------------------------------------------------------
def test_logistic_rectangle_matches_reference():
    ref_quad = ref_module(
        "alphadia.search.scoring.quadrupole",
        file="alphadia/search/scoring/quadrupole.py",
    )
    import jax.numpy as jnp

    from alphadia_tpu.ops.features import logistic_rectangle

    x = np.linspace(480.0, 530.0, 257)
    for mu1, mu2, s1, s2 in [
        (500.0, 512.0, 0.2, 0.2),
        (500.0, 512.0, 1.5, 0.8),
        (505.0, 506.0, 0.05, 0.4),
    ]:
        ref_y = ref_quad.logistic_rectangle(mu1, mu2, s1, s2, x)
        our_y = np.asarray(
            logistic_rectangle(
                jnp.float32(mu1), jnp.float32(mu2), jnp.float32(s1),
                jnp.float32(s2), jnp.asarray(x, jnp.float32),
            )
        )
        np.testing.assert_allclose(our_y, ref_y, atol=2e-6)


# ----------------------------------------------------------------------
# DIA cycle detection  (reference alphadia/raw_data/dia_cycle.py)
# ----------------------------------------------------------------------
def _cycle_spectra(n_cycles=40, preamble=7, seed=0):
    """Isolation windows with a non-DIA preamble before the first cycle."""
    lo = np.array([-1.0, 400.0, 425.0, 450.0, 475.0])
    hi = np.array([-1.0, 425.0, 450.0, 475.0, 500.0])
    low = np.concatenate([np.full(preamble, -1.0), np.tile(lo, n_cycles)])
    high = np.concatenate([np.full(preamble, -1.0), np.tile(hi, n_cycles)])
    rt = np.arange(len(low), dtype=np.float64) * 0.7
    return rt, low, high


def test_dia_cycle_matches_reference():
    ref_cycle = ref_module(
        "alphadia.raw_data.dia_cycle", file="alphadia/raw_data/dia_cycle.py"
    )
    from alphadia_tpu.rawdata.dia_cycle import determine_dia_cycle

    rt, low, high = _cycle_spectra()
    spectrum_df = pd.DataFrame(
        {"rt": rt, "isolation_lower_mz": low, "isolation_upper_mz": high}
    )
    ref_arr, ref_start, ref_len = ref_cycle.determine_dia_cycle(spectrum_df)
    our_arr, our_start, our_len = determine_dia_cycle(rt, low, high)
    assert our_len == ref_len
    assert our_start == ref_start
    np.testing.assert_allclose(our_arr, ref_arr)


def test_dia_cycle_rejects_aperiodic_like_reference():
    ref_cycle = ref_module(
        "alphadia.raw_data.dia_cycle", file="alphadia/raw_data/dia_cycle.py"
    )
    from alphadia_tpu.exceptions import NotDiaDataError
    from alphadia_tpu.rawdata.dia_cycle import determine_dia_cycle

    rng = np.random.default_rng(3)
    low = rng.uniform(400, 900, 300)
    high = low + 25.0
    rt = np.arange(300, dtype=np.float64)
    spectrum_df = pd.DataFrame(
        {"rt": rt, "isolation_lower_mz": low, "isolation_upper_mz": high}
    )
    with pytest.raises(Exception):
        ref_cycle.determine_dia_cycle(spectrum_df)
    with pytest.raises(NotDiaDataError):
        determine_dia_cycle(rt, low, high)


# ----------------------------------------------------------------------
# scoring profile utilities  (reference alphadia/search/scoring/utils.py,
# features/features_utils.py)
# ----------------------------------------------------------------------
def test_or_envelope_matches_reference():
    ref_utils = ref_module(
        "alphadia.search.scoring.utils", file="alphadia/search/scoring/utils.py"
    )
    import jax.numpy as jnp

    from alphadia_tpu.ops.features import or_envelope

    rng = np.random.default_rng(9)
    x1 = rng.random((6, 17)).astype(np.float64)
    ref_y = ref_utils.or_envelope_1d(x1.copy())
    our_y = np.asarray(or_envelope(jnp.asarray(x1)))
    np.testing.assert_allclose(our_y, ref_y, atol=1e-12)

    x2 = rng.random((3, 4, 17)).astype(np.float64)
    ref_y2 = ref_utils.or_envelope_2d(x2.copy())
    our_y2 = np.asarray(or_envelope(jnp.asarray(x2)))
    np.testing.assert_allclose(our_y2, ref_y2, atol=1e-12)


def test_cosine_similarity_matches_reference():
    """The observation-score cosine used in mean_observation_score."""
    ref_fu = ref_module(
        "alphadia.search.scoring.features.features_utils",
        file="alphadia/search/scoring/features/features_utils.py",
    )
    import jax.numpy as jnp

    from alphadia_tpu.ops.features import cosine_rows

    rng = np.random.default_rng(10)
    template = rng.random((4, 20))
    frags = rng.random((4, 20))
    ref_y = ref_fu.cosine_similarity_a1(template, frags)
    our_y = np.asarray(cosine_rows(jnp.asarray(frags), jnp.asarray(template)))
    np.testing.assert_allclose(our_y, ref_y, atol=1e-6)


# ----------------------------------------------------------------------
# selection peak finding + extents  (reference search/selection/utils.py)
# ----------------------------------------------------------------------
def test_find_peaks_1d_matches_reference():
    ref_sel = ref_module(
        "alphadia.search.selection.utils", file="alphadia/search/selection/utils.py"
    )
    import jax.numpy as jnp

    from alphadia_tpu.ops.peaks import find_peaks_profile

    rng = np.random.default_rng(11)
    for trial in range(5):
        profile = rng.random(40)
        _, ref_cycle, ref_int = ref_sel.find_peaks_1d(profile[None, :], top_n=3)
        idx, score, valid = find_peaks_profile(jnp.asarray(profile[None, :]), top_n=3)
        our_cycle = np.asarray(idx)[0][np.asarray(valid)[0]]
        assert set(our_cycle) == set(ref_cycle), f"trial {trial}"
        np.testing.assert_allclose(
            np.sort(np.asarray(score)[0][np.asarray(valid)[0]]),
            np.sort(ref_int),
            rtol=1e-6,
        )


def test_find_peaks_2d_matches_reference():
    ref_sel = ref_module(
        "alphadia.search.selection.utils", file="alphadia/search/selection/utils.py"
    )
    import jax.numpy as jnp

    from alphadia_tpu.ops.peaks import find_peaks_profile_2d

    rng = np.random.default_rng(12)
    S, W = 30, 40
    a = rng.random((S, W))
    # taper the scan edges: our kernel deliberately admits edge-scan apexes
    # (small-S mobility grids) where the reference's interior stencil
    # cannot; keep apexes interior so both see the same field
    taper = np.minimum(np.arange(S), np.arange(S)[::-1]).clip(max=3) / 3.0
    a = a * taper[:, None]
    ref_scan, ref_cycle, ref_int = ref_sel.find_peaks_2d(a, top_n=3)
    scan, cyc, score, valid = find_peaks_profile_2d(jnp.asarray(a[None]), top_n=3)
    v = np.asarray(valid)[0]
    ours = set(zip(np.asarray(scan)[0][v], np.asarray(cyc)[0][v]))
    assert ours == set(zip(ref_scan, ref_cycle))


def test_symmetric_limits_1d_matches_reference():
    ref_sel = ref_module(
        "alphadia.search.selection.utils", file="alphadia/search/selection/utils.py"
    )
    import jax.numpy as jnp

    from alphadia_tpu.ops.peaks import symmetric_limits_profile

    rng = np.random.default_rng(13)
    W = 50
    for trial in range(6):
        profile = np.convolve(rng.random(W), np.ones(5) / 5, mode="same")
        centers = np.array([[5, 20, 25, 48]], np.int32)
        ref_limits = np.stack(
            [
                ref_sel._symetric_limits_1d(
                    profile, int(c), f=0.95, center_fraction=0.01,
                    min_size=1, max_size=10,
                )
                for c in centers[0]
            ]
        )
        start, stop = symmetric_limits_profile(
            jnp.asarray(profile[None, :]), jnp.asarray(centers),
            f=0.95, center_fraction=0.01, min_size=1, max_size=10,
        )
        np.testing.assert_array_equal(np.asarray(start)[0], ref_limits[:, 0])
        np.testing.assert_array_equal(np.asarray(stop)[0], ref_limits[:, 1])


def test_symmetric_limits_2d_matches_reference():
    ref_sel = ref_module(
        "alphadia.search.selection.utils", file="alphadia/search/selection/utils.py"
    )
    import jax.numpy as jnp

    from alphadia_tpu.ops.peaks import symmetric_limits_2d

    rng = np.random.default_rng(14)
    S, W = 24, 40
    a = rng.random((S, W))
    kw = dict(
        f_mobility=0.95, f_rt=0.95, center_fraction=0.01,
        min_size_mobility=3, max_size_mobility=10,
        min_size_rt=2, max_size_rt=10,
    )
    for sc, cc in [(12, 20), (5, 8), (20, 35)]:
        ref_mob, ref_cyc = ref_sel.symetric_limits_2d(a, sc, cc, **kw)
        ss, se, cs, ce = symmetric_limits_2d(
            jnp.asarray(a[None]),
            jnp.asarray([[sc]], jnp.int32),
            jnp.asarray([[cc]], jnp.int32),
            **kw,
        )
        assert (int(np.asarray(ss)[0, 0]), int(np.asarray(se)[0, 0])) == tuple(
            ref_mob
        ), (sc, cc)
        assert (int(np.asarray(cs)[0, 0]), int(np.asarray(ce)[0, 0])) == tuple(
            ref_cyc
        ), (sc, cc)


# ----------------------------------------------------------------------
# calibration estimator  (reference alphadia/calibration/estimator.py)
# ----------------------------------------------------------------------
def test_calibration_estimator_matches_reference():
    """Same fitted predictions + 95% CI through the estimator wrapper."""
    ref_est_mod = ref_module("alphadia.calibration.estimator")
    from alphadia_tpu.calibration.estimator import CalibrationEstimator
    from alphadia_tpu.calibration.models import LOESSRegression

    rng = np.random.default_rng(15)
    mz = np.sort(rng.uniform(300, 1200, 800))
    ppm = 4.0 + 0.004 * (mz - 700) + rng.normal(0, 0.5, mz.shape)
    df = pd.DataFrame(
        {"mz_library": mz, "mz_observed": mz * (1 + ppm * 1e-6)}
    )

    ref_models = ref_module("alphadia.calibration.models")
    ref_est = ref_est_mod.CalibrationEstimator(
        name="mz",
        model=ref_models.LOESSRegression(n_kernels=6, polynomial_degree=2),
        input_columns=["mz_library"],
        target_columns=["mz_observed"],
        output_columns=["mz_calibrated"],
        transform_deviation="1e6",
    )
    our_est = CalibrationEstimator(
        name="mz",
        function=LOESSRegression(n_kernels=6, polynomial_degree=2),
        input_columns=["mz_library"],
        target_columns=["mz_observed"],
        output_columns=["mz_calibrated"],
        transform_deviation="1e6",
    )
    ref_df, our_df = df.copy(), df.copy()
    ref_est.fit(ref_df, plot=False)
    ref_est.predict(ref_df)
    our_est.fit(our_df)
    our_est.predict(our_df)
    # identical calibrated outputs to sub-0.1 ppm
    np.testing.assert_allclose(
        our_df["mz_calibrated"].to_numpy(),
        ref_df["mz_calibrated"].to_numpy(),
        rtol=1e-7,
    )
    ref_ci = ref_est.ci(ref_df, 0.95)
    our_ci = our_est.ci(our_df, 0.95)
    assert abs(our_ci - ref_ci) < 0.05 * max(ref_ci, 1e-9)


# ----------------------------------------------------------------------
# fragment competition  (reference alphadia/fragcomp/fragcomp.py)
# ----------------------------------------------------------------------
def test_fragment_competition_matches_reference():
    """Same survivors on an engineered window with shared fragments."""
    ref_fc = ref_module("alphadia.fragcomp.fragcomp")
    from alphadia_tpu.fdr.fragcomp import FragmentCompetition

    rng = np.random.default_rng(6)
    cycle = np.zeros((1, 3, 1, 2))
    cycle[0, 0] = [-1.0, -1.0]  # MS1 slot
    cycle[0, 1] = [400.0, 500.0]
    cycle[0, 2] = [500.0, 600.0]

    n = 60
    psm = pd.DataFrame(
        {
            "precursor_idx": np.arange(n),
            "rank": np.zeros(n, np.int64),
            "proba": rng.random(n).round(3),
            "rt_observed": rng.uniform(100, 140, n).round(1),
            "mz_observed": rng.uniform(405, 595, n),
        }
    )
    # fragments: clusters of PSMs engineered to share >=3 fragments
    frag_rows = []
    base_sets = [rng.uniform(200, 900, 6) for _ in range(12)]
    for i in range(n):
        shared = base_sets[i % len(base_sets)]
        own = rng.uniform(200, 900, 3)
        for mz in np.concatenate([shared, own]):
            frag_rows.append((i, 0, mz))
    frag = pd.DataFrame(frag_rows, columns=["precursor_idx", "rank", "mz"])
    frag["mz_observed"] = frag["mz"]

    ours = FragmentCompetition(rt_tol_seconds=5.0, mass_tol_ppm=15.0)(
        psm.copy(), frag.copy(), cycle
    )
    ref = ref_fc.FragmentCompetition(rt_tol_seconds=5.0, mass_tol_ppm=15.0)(
        psm.copy(), frag.copy(), cycle.copy()
    )
    assert set(ours["precursor_idx"]) == set(ref["precursor_idx"])
    # and competition actually removed something in this engineered setup
    assert len(ours) < n


# ----------------------------------------------------------------------
# fdrx statistics  (reference alphadia/fdr/_fdrx/stats.py)
# ----------------------------------------------------------------------
def test_fdrx_add_q_values_matches_reference():
    ref_stats = ref_module("alphadia.fdr._fdrx.stats")
    from alphadia_tpu.fdr.fdrx import add_q_values

    rng = np.random.default_rng(17)
    n = 500
    df = pd.DataFrame(
        {
            "decoy_proba": rng.random(n),
            "decoy": rng.integers(0, 2, n),
            "precursor_idx": rng.permutation(n),
        }
    )
    for r in (1.0, 2.5):
        ref = (
            ref_stats.add_q_values(df.copy(), r_target_decoy=r)
            .sort_values("precursor_idx")
            .reset_index(drop=True)
        )
        ours = (
            add_q_values(df.copy(), r_target_decoy=r)
            .sort_values("precursor_idx")
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(
            ours["qval"].to_numpy(), ref["qval"].to_numpy(), rtol=1e-12
        )


def test_fdrx_get_pep_matches_reference():
    ref_stats = ref_module("alphadia.fdr._fdrx.stats")
    from alphadia_tpu.fdr.fdrx import get_pep

    rng = np.random.default_rng(18)
    n = 2000
    decoy = rng.integers(0, 2, n)
    score = np.clip(rng.normal(0.3 + 0.4 * decoy, 0.15), 0.001, 0.999)
    df = pd.DataFrame({"decoy_proba": score, "decoy": decoy})
    ref_pep = ref_stats.get_pep(df)
    our_pep = get_pep(df)
    np.testing.assert_allclose(our_pep, ref_pep, rtol=1e-10)


# ----------------------------------------------------------------------
# FDR classifier quality  (reference alphadia/fdr/classifiers.py)
# ----------------------------------------------------------------------
def _auc(proba, y):
    order = np.argsort(proba)
    ranks = np.empty(len(proba))
    ranks[order] = np.arange(len(proba))
    n1, n0 = int(y.sum()), int((1 - y).sum())
    return (ranks[y == 1].sum() - n1 * (n1 - 1) / 2) / max(n1 * n0, 1)


def test_classifier_quality_matches_reference_torch():
    """Our flax classifier must discriminate as well as the reference's
    torch recipe (same architecture/hyperparameters) on identical data.
    Stochastic training — compare AUCs, not weights."""
    ref_cls = ref_module("alphadia.fdr.classifiers")
    from alphadia_tpu.models.classifier import BinaryClassifier

    rng = np.random.default_rng(16)
    n, d = 3000, 12
    y = rng.integers(0, 2, n)
    # overlapping classes: informative but not trivially separable
    X = rng.normal(0, 1, (n, d)) + y[:, None] * rng.normal(0.6, 0.1, d)
    X = X.astype(np.float32)

    ref_clf = ref_cls.BinaryClassifierLegacyNewBatching(
        test_size=0.01, epochs=10, random_state=0
    )
    ref_clf.fit(X, y)
    ref_auc = _auc(ref_clf.predict_proba(X)[:, 1], y)

    our_clf = BinaryClassifier(test_size=0.01, epochs=10, random_state=0)
    our_clf.fit(X, y)
    our_auc = _auc(our_clf.predict_proba(X)[:, 1], y)

    assert our_auc > 0.8, f"our classifier failed to learn (AUC {our_auc:.3f})"
    assert our_auc > ref_auc - 0.03, (
        f"our AUC {our_auc:.3f} materially below reference {ref_auc:.3f}"
    )


# ----------------------------------------------------------------------
# precursor scoring features  (reference features/precursor_features.py)
# ----------------------------------------------------------------------
def _golden_module():
    import importlib.util

    path = Path(__file__).parents[1] / "unit" / "test_scoring_golden.py"
    spec = importlib.util.spec_from_file_location("_golden", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_precursor_features_match_reference_function():
    """Run the reference's precursor_features() on dense arrays built from
    the golden fixture's hand-placed numbers and diff our kernel's feature
    row against it — MS1 intensity sums, weighted mass errors, isotope
    correlations AND the height features.

    The dense arrays replicate the reference pipeline exactly: the dummy
    2-row scan dim (candidate.py get_dense writes both rows), the
    obs-merge /(count+1e-6) on the m/z plane (candidate.py:262-269), and
    the frame window sliced to [frame_start, frame_stop) — so the
    tile(shape)-derived centers inside precursor_features (scan 2,
    frame 1) line up with our kernel's r4 reference-exact weighting.
    Intensity-sum features still differ by the documented dummy-scan 2x
    (the reference sums both identical scan rows); compared at 2x.
    """
    g = _golden_module()
    ref_pf = ref_module(
        "alphadia.search.scoring.features.precursor_features",
        file="alphadia/search/scoring/features/precursor_features.py",
    )

    # --- our kernel's feature row on the golden run --------------------
    from alphadia_tpu.rawdata import DiaData
    from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig

    dia = DiaData.from_spectra(g._build_spectra())
    prec = pd.DataFrame(
        {
            "precursor_idx": [7],
            "charge": [g.CHARGE],
            "mz_library": [g.MONO_MZ],
            "rt_library": [8.0],
            "flat_frag_start_idx": [0],
            "flat_frag_stop_idx": [len(g.FRAGS)],
            "i_0": [g.ISO_LIB[0]],
            "i_1": [g.ISO_LIB[1]],
            "i_2": [g.ISO_LIB[2]],
        }
    )
    frag = pd.DataFrame(
        {
            "mz_library": [f[0] for f in g.FRAGS],
            "intensity": [f[1] for f in g.FRAGS],
            "type": [f[2] for f in g.FRAGS],
            "position": [f[3] for f in g.FRAGS],
            "number": [1, 2, 3, 4],
            "charge": [1, 1, 1, 1],
            "loss_type": [0, 0, 0, 0],
            "cardinality": [1, 1, 1, 1],
        }
    )
    cand = pd.DataFrame(
        {
            "precursor_idx": [7],
            "rank": [0],
            "score": [1.0],
            "frame_center": [g.FRAME_CENTER],
            "frame_start": [g.FRAME_START],
            "frame_stop": [g.FRAME_STOP],
        }
    )
    cfg = ScoringConfig(
        top_k_fragments=4, top_k_isotopes=3, quant_window=3,
        quant_all=True, collect_fragments=True,
    )
    psm, _ = CandidateScoring(dia, prec, frag, cfg)(cand)
    ours = psm.iloc[0]

    # --- the reference function on equivalent dense arrays -------------
    W = g.W
    wmask = np.zeros(W, bool)
    wmask[g.FRAME_START : g.FRAME_STOP] = True
    ms1 = g.MS1_PROF.astype(np.float64) * wmask
    KI = 3
    Wwin = g.FRAME_STOP - g.FRAME_START
    dense = np.zeros((2, KI, 1, 2, Wwin))
    for k in range(KI):
        profile = ms1[g.FRAME_START : g.FRAME_STOP] * float(g.ISO_OBS[k])
        # both dummy scan rows written (alpharaw_jit.get_dense), m/z plane
        # carries the obs-merged /(count+1e-6) value at count=1
        for s in range(2):
            dense[0, k, 0, s] = profile
            dense[1, k, 0, s] = np.where(
                profile > 0,
                g.ISO_MZ[k] * (1 + g.MS1_PPM * 1e-6) / (1 + 1e-6),
                0.0,
            )
    feature_array = np.zeros(64)
    ref_pf.precursor_features(
        g.ISO_MZ.astype(np.float64),
        g.ISO_LIB.astype(np.float64),
        dense,
        np.array([1.0]),
        np.zeros((1, 2, Wwin)),
        feature_array,
    )

    # raw MS1 intensity sums travel bf16 on the wire (1/256 mantissa);
    # the reference's intensity SUMS double-count the dummy scan row (2x)
    for idx, name, rel, scale in [
        (4, "mono_ms1_intensity", 1 / 100, 2.0),
        (5, "top_ms1_intensity", 1 / 100, 2.0),
        (6, "sum_ms1_intensity", 1 / 100, 2.0),
        (7, "weighted_ms1_intensity", 1 / 100, 2.0),
        # ppm math runs in delta space (r4): compare at 1% of the truth
        (8, "weighted_mass_deviation", 1e-2, 1.0),
        (9, "weighted_mass_error", 1e-2, 1.0),
        (10, "mz_observed", 1e-5, 1.0),
        (15, "isotope_intensity_correlation", 2e-3, 1.0),
        # height features now reference-exact (weighted_center_mean with
        # the tile(shape) centers and dummy-scan distance terms); they
        # travel bf16 on the wire like the intensity sums -> 1% tolerance
        (11, "mono_ms1_height", 1 / 100, 1.0),
        (12, "top_ms1_height", 1 / 100, 1.0),
        (13, "sum_ms1_height", 1 / 100, 1.0),
        (14, "weighted_ms1_height", 1 / 100, 1.0),
        (16, "isotope_height_correlation", 2e-3, 1.0),
    ]:
        assert ours[name] * scale == pytest.approx(feature_array[idx], rel=rel), name


# ----------------------------------------------------------------------
# fragment scoring features  (reference features/fragment_features.py)
# ----------------------------------------------------------------------
def test_fragment_features_match_reference_function():
    """Run the reference's fragment_features() on dense arrays built from
    the golden fixture and diff our kernel's feature row.

    Ours equals the reference evaluated on the KERNEL-VALID fragment
    subset: the reference includes never-observed fragments in fraction
    denominators and mass-error means (an unobserved fragment contributes
    -1e6 ppm to mean_ms2_mass_error), where our kernel masks them out —
    deviation documented in docs/parity.md.
    """
    import types

    g = _golden_module()
    ref_ff = ref_module(
        "alphadia.search.scoring.features.fragment_features",
        file="alphadia/search/scoring/features/fragment_features.py",
    )

    from alphadia_tpu.rawdata import DiaData
    from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig

    dia = DiaData.from_spectra(g._build_spectra())
    prec = pd.DataFrame(
        {
            "precursor_idx": [7], "charge": [g.CHARGE],
            "mz_library": [g.MONO_MZ], "rt_library": [8.0],
            "flat_frag_start_idx": [0], "flat_frag_stop_idx": [4],
            "i_0": [g.ISO_LIB[0]], "i_1": [g.ISO_LIB[1]], "i_2": [g.ISO_LIB[2]],
        }
    )
    frag = pd.DataFrame(
        {
            "mz_library": [f[0] for f in g.FRAGS],
            "intensity": [f[1] for f in g.FRAGS],
            "type": [f[2] for f in g.FRAGS],
            "position": [f[3] for f in g.FRAGS],
            "number": [1, 2, 3, 4], "charge": [1] * 4,
            "loss_type": [0] * 4, "cardinality": [1] * 4,
        }
    )
    cand = pd.DataFrame(
        {
            "precursor_idx": [7], "rank": [0], "score": [1.0],
            "frame_center": [g.FRAME_CENTER],
            "frame_start": [g.FRAME_START], "frame_stop": [g.FRAME_STOP],
        }
    )
    psm, _ = CandidateScoring(
        dia, prec, frag,
        ScoringConfig(top_k_fragments=4, top_k_isotopes=3, quant_window=3,
                      quant_all=True, collect_fragments=True),
    )(cand)
    ours = psm.iloc[0]

    # reference inputs over the kernel-valid fragments (f3 never observed)
    valid = [0, 1, 2]
    W = g.W
    wmask = np.zeros(W, bool)
    wmask[g.FRAME_START : g.FRAME_STOP] = True
    prof = g.PROF.astype(np.float64) * wmask
    nF = len(valid)
    dense = np.zeros((2, nF, 1, 1, W))
    for j, f in enumerate(valid):
        dense[0, j, 0, 0] = prof[f]
        dense[1, j, 0, 0] = np.where(
            prof[f] > 0, g.FRAGS[f][0] * (1 + g.MS2_PPM * 1e-6), 0.0
        )
    frame_profile = dense[0].sum(axis=2)
    frame_rt = np.arange(W, dtype=np.float64)
    ms1 = g.MS1_PROF.astype(np.float64) * wmask
    frags = types.SimpleNamespace(
        intensity=np.array([g.FRAGS[f][1] for f in valid], np.float32),
        mz=np.array([g.FRAGS[f][0] for f in valid], np.float64),
        type=np.array([g.FRAGS[f][2] for f in valid], np.uint8),
        position=np.array([g.FRAGS[f][3] for f in valid], np.uint8),
    )
    fa = np.zeros(64)
    # the real pipeline's template carries the dummy 2-row scan dim
    # (identical rows), putting the scan center-of-mass at 0.5 — the
    # weighted_center_mean distances become sqrt(0.25 + df^2), which is
    # what our kernel's collapsed-scan weighting replicates; a 1-row
    # template would put the com at 0 (plain |df|), a shape the pipeline
    # never produces
    template_2row = np.repeat(ms1.reshape(1, 1, W), 2, axis=1).copy()
    ref_ff.fragment_features(
        dense, frame_profile, frame_rt, np.array([1.0]),
        template_2row, frags, fa,
        quant_window=3, quant_all=True,
    )

    for idx, name, tol in [
        (18, "intensity_correlation", 5e-3),
        (19, "height_correlation", 5e-3),
        (20, "intensity_fraction", 1e-3),
        (21, "height_fraction", 1e-3),
        (22, "intensity_fraction_weighted", 1e-3),
        (23, "height_fraction_weighted", 1e-3),
        (24, "mean_observation_score", 1e-3),
        (25, "sum_b_ion_intensity", 2e-3),
        (26, "sum_y_ion_intensity", 2e-3),
        (27, "diff_b_y_ion_intensity", 2e-2),
        (41, "top_3_ms2_mass_error", 2e-2),
        (42, "mean_ms2_mass_error", 2e-2),
        (43, "n_overlapping", 1e-6),
        (44, "mean_overlapping_intensity", 1e-2),
        (45, "mean_overlapping_mass_error", 2e-2),
    ]:
        assert float(ours[name]) == pytest.approx(fa[idx], rel=tol, abs=1e-6), (
            f"{name}: ours {float(ours[name])} vs reference {fa[idx]}"
        )


# ----------------------------------------------------------------------
# profile scoring features  (reference features/profile_features.py)
# ----------------------------------------------------------------------
def test_profile_features_match_reference_function():
    """Frame correlations, b/y correlation splits, cycle FWHM, and the
    frame-peak displacement vs the reference's profile_features() on the
    golden fixture (valid-fragment subset; experimental_xic path).

    This oracle caught a real bug: features 33/38/39 were weighted by RAW
    library intensities instead of normalized ones, scaling them with the
    library's intensity sum.
    """
    import types

    g = _golden_module()
    ref_pfl = ref_module(
        "alphadia.search.scoring.features.profile_features",
        file="alphadia/search/scoring/features/profile_features.py",
    )

    from alphadia_tpu.rawdata import DiaData
    from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig

    dia = DiaData.from_spectra(g._build_spectra())
    prec = pd.DataFrame(
        {
            "precursor_idx": [7], "charge": [g.CHARGE],
            "mz_library": [g.MONO_MZ], "rt_library": [8.0],
            "flat_frag_start_idx": [0], "flat_frag_stop_idx": [4],
            "i_0": [g.ISO_LIB[0]], "i_1": [g.ISO_LIB[1]], "i_2": [g.ISO_LIB[2]],
        }
    )
    frag = pd.DataFrame(
        {
            "mz_library": [f[0] for f in g.FRAGS],
            "intensity": [f[1] for f in g.FRAGS],
            "type": [f[2] for f in g.FRAGS],
            "position": [f[3] for f in g.FRAGS],
            "number": [1, 2, 3, 4], "charge": [1] * 4,
            "loss_type": [0] * 4, "cardinality": [1] * 4,
        }
    )
    cand = pd.DataFrame(
        {
            "precursor_idx": [7], "rank": [0], "score": [1.0],
            "frame_center": [g.FRAME_CENTER],
            "frame_start": [g.FRAME_START], "frame_stop": [g.FRAME_STOP],
        }
    )
    psm, _ = CandidateScoring(
        dia, prec, frag,
        ScoringConfig(top_k_fragments=4, top_k_isotopes=3, quant_window=3,
                      quant_all=True, collect_fragments=True),
    )(cand)
    ours = psm.iloc[0]

    valid = [0, 1, 2]
    W = g.W
    # the real pipeline's dense profiles span exactly the candidate window
    # [frame_start, frame_stop) (Candidate.process passes those frame
    # limits to get_dense), and rt_values are at SPECTRUM granularity —
    # feed the reference function the same, not a padded-window profile
    cand = slice(g.FRAME_START, g.FRAME_STOP)
    cand_len = g.FRAME_STOP - g.FRAME_START
    prof = g.PROF.astype(np.float64)[:, cand]
    frame_profile = prof[valid].reshape(len(valid), 1, cand_len)
    scan_profile = prof[valid].sum(axis=1).reshape(len(valid), 1, 1)
    ms1 = g.MS1_PROF.astype(np.float64)[cand]
    n_slots = 8  # arbitrary spectra per cycle; rt in cycle units
    dia_stub = types.SimpleNamespace(
        rt_values=np.arange(g.N_CYCLES * n_slots, dtype=np.float64) / n_slots,
        has_mobility=False,
        mobility_values=np.zeros(1),
    )
    fint = np.array([g.FRAGS[f][1] for f in valid], np.float32)
    fa = np.zeros(64)
    ref_pfl.profile_features(
        dia_stub, fint / fint.sum(),
        np.array([g.FRAGS[f][2] for f in valid], np.uint8),
        np.array([1.0]), scan_profile, frame_profile,
        np.array([[ms1.sum()]]), ms1.reshape(1, cand_len),
        0, 1, g.FRAME_START * n_slots, g.FRAME_STOP * n_slots, fa, True,
    )

    # cycle_fwhm tolerance: the kernel's rt_width is the exclusive-stop
    # cycle span; the reference's is rt[stop-1]-rt[start] over spectra —
    # a known cycle_time/n_slots residual (docs/parity.md)
    for idx, name, tol in [
        (31, "fragment_frame_correlation", 5e-3),
        (32, "top3_frame_correlation", 5e-3),
        (33, "template_frame_correlation", 5e-3),
        (34, "top3_b_ion_correlation", 5e-3),
        (35, "n_b_ions", 1e-6),
        (36, "top3_y_ion_correlation", 5e-3),
        (37, "n_y_ions", 1e-6),
        (38, "cycle_fwhm", 2e-2),
        (40, "delta_frame_peak", 1e-6),
    ]:
        assert float(ours[name]) == pytest.approx(fa[idx], rel=tol, abs=1e-5), (
            f"{name}: ours {float(ours[name])} vs reference {fa[idx]}"
        )


# ----------------------------------------------------------------------
# multiplex candidate expansion  (reference search/scoring/utils.py)
# ----------------------------------------------------------------------
def test_multiplex_candidates_match_reference():
    """Same (precursor, channel) expansion with the best-per-elution-group
    coordinates."""
    ref_utils = ref_module(
        "alphadia.search.scoring.utils", file="alphadia/search/scoring/utils.py"
    )
    from alphadia_tpu.workflow.peptidecentric.multiplexing_handler import (
        multiplex_candidates,
    )

    rng = np.random.default_rng(19)
    channels = [0, 4, 8, 12]
    # library: 6 elution groups x 4 channels
    rows = []
    pid = 0
    for eg in range(6):
        for ch in channels:
            rows.append(
                {
                    "precursor_idx": np.uint32(pid),
                    "elution_group_idx": np.uint32(eg),
                    "channel": np.uint32(ch),
                    "decoy": np.uint8(0),
                    "charge": np.uint8(2),
                    "flat_frag_start_idx": np.uint32(0),
                    "flat_frag_stop_idx": np.uint32(3),
                    "rt_library": np.float32(100 + eg),
                    "mobility_library": np.float32(0.0),
                    "mz_library": np.float32(500 + eg),
                    "proteins": "P1",
                    "genes": "G1",
                }
            )
            pid += 1
    lib = pd.DataFrame(rows)
    # reference validation (pandas<3 era) chokes on pandas 3 StringDtype
    for c in ("proteins", "genes"):
        lib[c] = lib[c].astype(object)

    # confident reference-channel PSMs: two candidates for eg 0 (ranks with
    # different proba — the better one must donate coordinates), one each
    # for egs 1 and 2
    cand_rows = []
    for eg, rank, proba, fc in [(0, 0, 0.30, 50), (0, 1, 0.05, 60), (1, 0, 0.10, 70), (2, 0, 0.20, 80)]:
        cand_rows.append(
            {
                "precursor_idx": np.int64(eg * 4),  # channel-0 sibling
                "elution_group_idx": np.uint32(eg),
                "channel": np.uint32(0),
                "rank": np.uint8(rank),
                "score": np.float32(10 - 10 * proba),
                "proba": np.float32(proba),
                "scan_start": np.int64(0),
                "scan_center": np.int64(0),
                "scan_stop": np.int64(1),
                "frame_start": np.int64(fc - 5),
                "frame_center": np.int64(fc),
                "frame_stop": np.int64(fc + 5),
            }
        )
    cand = pd.DataFrame(cand_rows).sample(frac=1.0, random_state=rng.integers(99))

    ref_out = ref_utils.multiplex_candidates(
        cand.copy(), lib.copy(), channels=channels
    )
    our_out = multiplex_candidates(cand.copy(), lib.copy(), reference_channel=0)

    ref_set = set(zip(ref_out["precursor_idx"], ref_out["channel"]))
    our_set = set(
        zip(our_out["precursor_idx"].astype(int), our_out["channel"].astype(int))
    )
    assert our_set == ref_set
    # best-per-elution-group coordinates (eg 0 must use frame_center 60,
    # the proba-0.05 candidate)
    ref_eg0 = ref_out[ref_out["elution_group_idx"] == 0]
    our_eg0 = our_out[our_out["elution_group_idx"] == 0]
    assert set(ref_eg0["frame_center"]) == {60}
    assert set(our_eg0["frame_center"]) == {60}


# ----------------------------------------------------------------------
# candidate hash  (reference alphadia/fragcomp/utils.py)
# ----------------------------------------------------------------------
def test_candidate_hash_matches_reference():
    ref_utils = ref_module("alphadia.fragcomp.utils")
    from alphadia_tpu.utils.misc import candidate_hash

    rng = np.random.default_rng(4)
    idx = rng.integers(0, 2**31, 1000, dtype=np.int64).astype(np.uint32)
    rank = rng.integers(0, 5, 1000).astype(np.uint8)
    ours = candidate_hash(idx, rank)
    ref = ref_utils.candidate_hash(idx, rank)
    np.testing.assert_array_equal(
        np.asarray(ours, np.uint64), np.asarray(ref, np.uint64)
    )
