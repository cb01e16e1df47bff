"""Packaged property-model weights must carry their validation gates.

The training/packaging script (scripts/train_property_models.py) refuses
to save weights that fail its three published-constants gates; this test
pins the CONTRACT on the shipped artifact so a regression (stale
repackage, corrupted metrics, silently weakened gates) fails loudly.
Mirrors the real-data role of the reference's shipped peptdeep models
(reference: alphadia/libtransform/prediction.py:14-90).
"""

import pickle
from pathlib import Path

WEIGHTS = (
    Path(__file__).parents[2]
    / "alphadia_tpu"
    / "constants"
    / "weights"
    / "peptdeep_default"
    / "models.pkl"
)


def _load():
    with open(WEIGHTS, "rb") as f:
        return pickle.load(f)


def test_packaged_models_have_all_heads():
    state = _load()
    assert set(state["variables"]) >= {"rt", "charge", "ms2", "ccs"}


def test_packaged_cross_world_metrics():
    m = _load()["metrics"]
    cross = m["cross_world"]
    # cross-world (unseen world seed) gates from the packaging script
    assert cross["rt_r2"] >= 0.9
    assert cross["rt_r2"] >= cross["rt_r2_heuristic"] + 0.1
    assert cross["ms2_sa"] >= 0.6
    assert cross["eval_seed"] not in cross["train_seeds"]


def test_packaged_published_constants_gates():
    m = _load()["metrics"]
    pub = m["published_constants"]
    assert pub["ok"] is True
    # Krokhin 2004 additive-hydrophobicity RT order
    assert pub["krokhin_spearman"] >= 0.9
    # Meier 2021 per-charge mass-CCS trend + charge ordering of 1/K0
    assert pub["ccs"]["mass_corr_z2"] >= 0.9
    assert pub["ccs"]["mass_corr_z3"] >= 0.9
    assert pub["ccs"]["charge_ordering_ok"]
    # tryptic 2+/3+ charge dominance and basicity monotonicity
    assert pub["charge"]["frac_top_2_or_3"] >= 0.8
    assert pub["charge"]["frac_top_1"] < 0.05
    assert pub["charge"]["basic_residue_spearman"] >= 0.6
