"""Protein-inference taxonomy battery for perform_grouping.

Scenario set follows the classic shotgun-proteomics interpretation cases
(Nesvizhskii & Aebersold, MCP 2005, Fig. 5 — the same taxonomy the
reference validates against): distinct, differentiable, indistinguishable,
subset, subsumable, shared-only, circular, and a multi-protein complex
case; plus decoy separation and randomized invariants.
"""

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.outputs.grouping import perform_grouping

# each case: (name, peptide->proteins list, expected masters, expected pg)
CASES = [
    (
        "distinct",
        ["A", "A", "B", "B"],
        ["A", "A", "B", "B"],
        ["A", "A", "B", "B"],
    ),
    (
        "differentiable",
        ["A", "A;B", "A;B", "B"],
        ["A", "A", "A", "B"],
        ["A", "A;B", "A;B", "B"],
    ),
    (
        "indistinguishable",
        ["A;B", "A;B", "A;B", "A;B"],
        ["A", "A", "A", "A"],
        ["A", "A", "A", "A"],
    ),
    (
        "subset",
        ["A", "A;B", "A;B", "A"],
        ["A", "A", "A", "A"],
        ["A", "A", "A", "A"],
    ),
    (
        "subsumable",
        ["A", "A;B", "B;C", "C"],
        ["A", "A", "C", "C"],
        ["A", "A", "C", "C"],
    ),
    (
        "shared_only",
        ["A;B", "A;B", "A;C", "A;C"],
        ["A", "A", "A", "A"],
        ["A", "A", "A", "A"],
    ),
    (
        "circular",
        ["A;C", "B;C", "B;C", "A"],
        ["C", "C", "C", "A"],
        ["A;C", "C", "C", "A"],
    ),
    (
        "complex",
        ["P1;P2;P3", "P1;P4", "P2;P5", "P2"],
        ["P2", "P1", "P2", "P2"],
        ["P1;P2", "P1", "P2", "P2"],
    ),
]


@pytest.mark.parametrize("name,prots,exp_master,exp_pg", CASES, ids=[c[0] for c in CASES])
def test_inference_case(name, prots, exp_master, exp_pg):
    df = pd.DataFrame(
        {
            "precursor_idx": np.arange(len(prots)),
            "proteins": prots,
            "decoy": 0,
        }
    )
    out = perform_grouping(df, group=True)
    assert list(out["pg_master"]) == exp_master, name
    assert list(out["pg"]) == exp_pg, name


def test_gene_level_grouping():
    df = pd.DataFrame(
        {
            "precursor_idx": [0, 1, 2],
            "genes": ["G1", "G1;G2", "G2"],
            "proteins": ["x", "y", "z"],
            "decoy": 0,
        }
    )
    out = perform_grouping(df, genes_or_proteins="genes")
    assert set(out["pg_master"]) <= {"G1", "G2"}


def test_decoys_grouped_separately():
    # identical protein names on both sides must not cross-contaminate
    df = pd.DataFrame(
        {
            "precursor_idx": [0, 1, 2, 3],
            "proteins": ["A;B", "B", "A;B", "B"],
            "decoy": [0, 0, 1, 1],
        }
    )
    out = perform_grouping(df)
    t = out[out.decoy == 0]
    d = out[out.decoy == 1]
    # each class solved independently with the same structure
    assert list(t["pg_master"]) == list(d["pg_master"])


def test_multiple_charge_states_same_precursor():
    # duplicate precursor_idx rows (e.g. after channel explosion) must get
    # a consistent assignment, not be lost
    df = pd.DataFrame(
        {
            "precursor_idx": [0, 0, 1],
            "proteins": ["A", "A", "A;B"],
            "decoy": 0,
        }
    )
    out = perform_grouping(df)
    assert len(out) == 3
    assert (out[out.precursor_idx == 0]["pg_master"] == "A").all()


def test_randomized_invariants():
    rng = np.random.default_rng(11)
    proteins = [f"P{i}" for i in range(30)]
    for trial in range(10):
        n = int(rng.integers(5, 200))
        prot_lists = [
            ";".join(
                rng.choice(proteins, size=int(rng.integers(1, 4)), replace=False)
            )
            for _ in range(n)
        ]
        df = pd.DataFrame(
            {
                "precursor_idx": np.arange(n),
                "proteins": prot_lists,
                "decoy": rng.integers(0, 2, n),
            }
        )
        out = perform_grouping(df)
        # no precursor lost, none unassigned
        assert len(out) == n
        assert out["pg_master"].notna().all()
        assert (out["pg"] != "").all()
        # master is always one of the precursor's own proteins
        for r in out.itertuples():
            assert r.pg_master in str(
                df.loc[df.precursor_idx == r.precursor_idx, "proteins"].iloc[0]
            ).split(";")
        # heuristic pg only contains master proteins of the same decoy class
        masters = set(out["pg_master"])
        for pg in out["pg"]:
            assert set(pg.split(";")) <= masters
