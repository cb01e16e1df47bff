import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.fdr import get_q_values, keep_best, perform_fdr
from alphadia_tpu.fdr.fragcomp import FragmentCompetition
from alphadia_tpu.fdr.qvalues import fdr_to_q_values
from alphadia_tpu.models.classifier import BinaryClassifier


def test_fdr_to_q_values():
    fdr = np.array([0.1, 0.05, 0.3, 0.2, 0.4])
    np.testing.assert_allclose(fdr_to_q_values(fdr), [0.05, 0.05, 0.2, 0.2, 0.4])


def test_get_q_values_two_gaussians():
    rng = np.random.default_rng(0)
    n = 2000
    # targets score lower (better), decoys higher
    proba = np.concatenate([rng.normal(0.3, 0.1, n), rng.normal(0.7, 0.1, n)])
    decoy = np.concatenate([np.zeros(n), np.ones(n)])
    df = pd.DataFrame(
        {"proba": proba, "_decoy": decoy, "precursor_idx": np.arange(2 * n)}
    )
    out = get_q_values(df)
    sub = out[(out["_decoy"] == 0) & (out["qval"] < 0.01)]
    # most targets should survive at 1% FDR given good separation
    assert len(sub) > n * 0.5
    # q-values monotone in proba order
    assert (np.diff(out["qval"].to_numpy()) >= -1e-12).all()


def test_keep_best():
    df = pd.DataFrame(
        {
            "proba": [0.1, 0.5, 0.2, 0.9],
            "channel": [0, 0, 0, 0],
            "precursor_idx": [1, 1, 2, 2],
        }
    )
    out = keep_best(df)
    assert len(out) == 2
    assert set(out["proba"]) == {0.1, 0.2}


def _synthetic_psm(n=3000, n_features=10, seed=1, separation=1.5):
    rng = np.random.default_rng(seed)
    X_t = rng.normal(separation, 1.0, (n, n_features))
    X_d = rng.normal(0.0, 1.0, (n, n_features))
    cols = [f"f{i}" for i in range(n_features)]
    t = pd.DataFrame(X_t, columns=cols)
    d = pd.DataFrame(X_d, columns=cols)
    for df, dec in ((t, 0), (d, 1)):
        df["precursor_idx"] = np.arange(len(df)) * 2 + dec
        df["elution_group_idx"] = np.arange(len(df))
        df["channel"] = 0
    return t, d, cols


def test_classifier_separates():
    t, d, cols = _synthetic_psm()
    clf = BinaryClassifier(random_state=0, epochs=5)
    X = np.concatenate([t[cols], d[cols]])
    y = np.concatenate([np.zeros(len(t)), np.ones(len(d))])
    clf.fit(X, y)
    proba = clf.predict_proba(X)[:, 1]
    assert proba.shape == (len(X),)
    auc_proxy = proba[len(t) :].mean() - proba[: len(t)].mean()
    assert auc_proxy > 0.5  # decoys score much higher

    # round trip through state dict
    clf2 = BinaryClassifier.from_state_dict(clf.to_state_dict())
    np.testing.assert_allclose(
        clf2.predict_proba(X[:64]), clf.predict_proba(X[:64]), atol=1e-5
    )


def test_classifier_scan_training_semantics():
    """The lax.scan training path: deterministic under a fixed seed,
    padded (masked) steps leave state untouched, per-epoch loss metric
    bookkeeping intact."""
    t, d, cols = _synthetic_psm(n=700)  # odd size -> num_batches not pow2
    X = np.concatenate([t[cols], d[cols]])
    y = np.concatenate([np.zeros(len(t)), np.ones(len(d))])

    clf_a = BinaryClassifier(random_state=7, epochs=4)
    clf_a.fit(X, y)
    clf_b = BinaryClassifier(random_state=7, epochs=4)
    clf_b.fit(X, y)
    np.testing.assert_allclose(
        clf_a.predict_proba(X[:128]), clf_b.predict_proba(X[:128]), atol=1e-6
    )
    # one loss entry per epoch, all finite and nonzero (a masked padded
    # step would contribute an exact 0.0)
    assert len(clf_a.metrics["train_loss"]) == 4
    assert all(np.isfinite(v) and v > 0 for v in clf_a.metrics["train_loss"])
    # training moved the loss
    assert clf_a.metrics["train_loss"][-1] < clf_a.metrics["train_loss"][0] * 1.5


def test_perform_fdr_end_to_end():
    t, d, cols = _synthetic_psm(n=2000)
    clf = BinaryClassifier(random_state=0, epochs=5)
    out = perform_fdr(
        clf, cols, t, d, competitive=True, random_state=0
    )
    assert {"qval", "proba"} <= set(out.columns)
    n_pass = ((out["qval"] < 0.01) & (out["_decoy"] == 0)).sum()
    assert n_pass > 1000
    # decoys at 1% FDR should be ~1% of targets
    n_decoy_pass = ((out["qval"] < 0.01) & (out["_decoy"] == 1)).sum()
    assert n_decoy_pass <= max(0.05 * n_pass, 30)


def test_perform_fdr_too_few():
    # tiny-but-trainable sets fall back to balanced logistic regression —
    # real q-values, not the old blanket qval=1
    t, d, cols = _synthetic_psm(n=5)
    clf = BinaryClassifier(random_state=0)
    out = perform_fdr(clf, cols, t, d)
    assert out["qval"].between(0, 1).all()
    # even 2 decoys train the LR fallback; q-values stay in range
    t2, d2, cols2 = _synthetic_psm(n=5)
    out2 = perform_fdr(clf, cols2, t2, d2.iloc[:2])
    assert out2["qval"].between(0, 1).all()
    # zero decoys: decoy-counting q-values are 0 by construction
    t3, d3, cols3 = _synthetic_psm(n=5)
    out3 = perform_fdr(clf, cols3, t3, d3.iloc[:0])
    assert (out3["qval"] == 0.0).all()


def test_fragment_competition():
    # two PSMs in same window, same RT, sharing >=3 fragments: worse one dies
    cycle = np.zeros((1, 3, 1, 2))
    cycle[0, 0, 0] = [-1, -1]
    cycle[0, 1, 0] = [400, 500]
    cycle[0, 2, 0] = [500, 600]
    psm = pd.DataFrame(
        {
            "precursor_idx": [1, 2, 3],
            "rank": [0, 0, 0],
            "proba": [0.1, 0.5, 0.2],
            "rt_observed": [100.0, 100.5, 300.0],
            "mz_library": [450.0, 451.0, 450.5],
        }
    )
    frag_rows = []
    shared = [200.0, 300.0, 400.0, 500.0]
    for pid, mzs in [(1, shared), (2, shared), (3, [250.0, 350.0, 450.0, 550.0])]:
        for mz in mzs:
            frag_rows.append({"precursor_idx": pid, "rank": 0, "mz": mz})
    frag = pd.DataFrame(frag_rows)
    out = FragmentCompetition()(psm, frag, cycle)
    assert set(out["precursor_idx"]) == {1, 3}


def test_fragment_competition_ignores_windowless_psms():
    """A PSM whose m/z matches NO isolation window must not compete
    (argmax over all-False previously bucketed it into window 0)."""
    cycle = np.zeros((1, 2, 1, 2))
    cycle[0, 0, 0] = [400, 500]
    cycle[0, 1, 0] = [500, 600]
    shared = [200.0, 300.0, 400.0, 500.0]
    psm = pd.DataFrame(
        {
            "precursor_idx": [1, 2],
            "rank": [0, 0],
            "proba": [0.1, 0.5],
            "rt_observed": [100.0, 100.2],
            # 450 lands in window 0; 9999 matches no window at all
            "mz_library": [450.0, 9999.0],
        }
    )
    frag = pd.DataFrame(
        [{"precursor_idx": p, "rank": 0, "mz": m} for p in (1, 2) for m in shared]
    )
    out = FragmentCompetition()(psm, frag, cycle)
    # without the fix PSM 2 lands in window 0 and is killed by PSM 1
    assert set(out["precursor_idx"]) == {1, 2}


def test_fragment_competition_rt_neighborhood_equivalence():
    """The RT-sorted bounded inner loop must match the brute-force pairwise
    semantics on randomized data."""
    rng = np.random.default_rng(11)
    n = 120
    cycle = np.zeros((1, 2, 1, 2))
    cycle[0, 0, 0] = [400, 500]
    cycle[0, 1, 0] = [500, 600]
    psm = pd.DataFrame(
        {
            "precursor_idx": np.arange(n),
            "rank": 0,
            "proba": rng.uniform(0, 1, n),
            "rt_observed": rng.uniform(0, 40, n),  # dense: many neighbors
            "mz_library": rng.choice([450.0, 550.0], n),
        }
    )
    # fragments drawn from a tiny pool so overlaps are common
    pool = np.array([210.0, 220.0, 230.0, 240.0, 250.0, 260.0])
    frag = pd.DataFrame(
        {
            "precursor_idx": np.repeat(np.arange(n), 4),
            "rank": 0,
            "mz": rng.choice(pool, n * 4),
        }
    )
    out = FragmentCompetition(rt_tol_seconds=3.0)(psm, frag, cycle)

    # brute force oracle with the original O(n^2) semantics
    def brute(psm, frag):
        df = psm.copy()
        lower, upper = cycle[0, :, 0, 0], cycle[0, :, 0, 1]
        mz = df["mz_library"].to_numpy()[:, None]
        inside = (mz >= lower[None, :]) & (mz < upper[None, :])
        df["w"] = np.argmax(inside, axis=1)
        df = df.sort_values(["w", "proba", "precursor_idx"], kind="stable")
        fr = {p: g["mz"].to_numpy() for p, g in frag.groupby("precursor_idx")}
        rt = df["rt_observed"].to_numpy()
        pid = df["precursor_idx"].to_numpy()
        w = df["w"].to_numpy()
        valid = np.ones(len(df), bool)
        for a in range(len(df)):
            if not valid[a]:
                continue
            for b in range(a + 1, len(df)):
                if w[a] != w[b] or not valid[b]:
                    continue
                if abs(rt[a] - rt[b]) >= 3.0:
                    continue
                d = np.abs(fr[pid[a]][:, None] - fr[pid[b]][None, :]) / fr[pid[a]][:, None] * 1e6
                if (d < 15.0).sum() >= 3:
                    valid[b] = False
        return set(pid[valid])

    assert set(out["precursor_idx"]) == brute(psm, frag)
