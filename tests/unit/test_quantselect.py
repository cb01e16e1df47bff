"""QuantSelect-equivalent LFQ (outputs/quant.py quantselect_lfq).

Property tests: known cross-run ratios are recovered under missingness,
and low-quality ions are down-weighted relative to plain directLFQ.
(reference: quant_builder.py:247-283 delegates to the external quantselect
package; the self-contained scheme here must satisfy the same contract —
feature-informed ion weighting before aggregation.)
"""

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.outputs.quant import (
    QUANTSELECT_FEATURES,
    accumulate_frag_df,
    direct_lfq,
    quantselect_lfq,
    quantselect_ion_scores,
)

RUNS = ["runA", "runB", "runC"]
RUN_FACTOR = {"runA": 1.0, "runB": 2.0, "runC": 0.5}  # known ratios


def _make_runs(n_prec=50, n_frag=6, missing=0.0, noisy_ion=False, seed=0):
    rng = np.random.default_rng(seed)
    base = 10 ** rng.uniform(3.5, 6, n_prec)
    shape = np.array([1.0, 0.6, 0.4, 0.3, 0.2, 0.1])[:n_frag]
    runs = {}
    for run in RUNS:
        rows = []
        for p in range(n_prec):
            for f in range(n_frag):
                inten = base[p] * RUN_FACTOR[run] * shape[f] * rng.uniform(0.9, 1.1)
                corr = rng.uniform(0.85, 1.0)
                me = rng.normal(0, 1.0)
                if noisy_ion and f == 0:
                    # fragment 0 is garbage: huge variance, bad correlation
                    inten = base[p] * 10 ** rng.uniform(-1.5, 1.5)
                    corr = rng.uniform(0.0, 0.2)
                    me = rng.normal(0, 12.0)
                if rng.random() < missing:
                    continue
                rows.append(
                    {
                        "precursor_idx": p,
                        "number": f + 1,
                        "type": 121,
                        "charge": 1,
                        "loss_type": 0,
                        "intensity": inten,
                        "correlation": corr,
                        "mass_error": me,
                        "height": inten * 0.8,
                    }
                )
        runs[run] = pd.DataFrame(rows)
    return runs, base


def _ratio_error(lfq, num="runB", den="runA", expected=None):
    expected = expected or RUN_FACTOR[num] / RUN_FACTOR[den]
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.log2(lfq[num].to_numpy() / lfq[den].to_numpy()) - np.log2(expected)
    return np.nanmedian(np.abs(r))


@pytest.mark.parametrize("missing", [0.0, 0.3])
def test_known_ratios_recovered_under_missingness(missing):
    runs, base = _make_runs(missing=missing)
    feats = accumulate_frag_df(runs, columns=QUANTSELECT_FEATURES)
    lfq = quantselect_lfq(
        feats, feats["intensity"]["precursor_idx"], RUNS, min_nonnan=1
    )
    assert len(lfq) >= 45
    # note: quantselect normalizes run shifts away like directLFQ, so the
    # *within-run* quantity ordering is what must survive; check against truth
    got = lfq.set_index("group")["runA"]
    truth = pd.Series(base, index=np.arange(len(base))).reindex(got.index)
    r = np.corrcoef(np.log2(truth), np.log2(got))[0, 1]
    assert r > 0.95
    # relative run levels preserved BEFORE normalization removes them is not
    # required; instead the residual spread must be small
    assert _ratio_error(lfq, expected=1.0) < 0.35


def test_noisy_ion_downweighted_vs_directlfq():
    runs, _ = _make_runs(n_prec=40, noisy_ion=True, seed=3)
    feats = accumulate_frag_df(runs, columns=QUANTSELECT_FEATURES)
    keys = feats["intensity"]["precursor_idx"]

    w = quantselect_ion_scores(feats, RUNS)
    frag_no = feats["intensity"]["ion"].to_numpy() >> 32 & 0xFF
    # the garbage fragment (number 1) must score well below the clean ones
    assert w[frag_no == 1].mean() < 0.6 * w[frag_no != 1].mean()

    qs = quantselect_lfq(feats, keys, RUNS, min_nonnan=1)
    dl = direct_lfq(feats["intensity"], keys, RUNS, normalize=True, min_nonnan=1)
    # both remove run shifts; quantselect must not be worse, and the noisy
    # ion should make its residual spread at least as tight
    assert _ratio_error(qs, expected=1.0) <= _ratio_error(dl, expected=1.0) + 0.02


def test_ion_scores_without_optional_features():
    runs, _ = _make_runs(n_prec=5)
    feats = accumulate_frag_df(runs, columns=("intensity",))
    w = quantselect_ion_scores(feats, RUNS)
    assert w.shape == (len(feats["intensity"]),)
    assert (w > 0).all() and (w <= 1).all()
