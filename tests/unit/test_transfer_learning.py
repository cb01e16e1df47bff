import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.models.finetune import FinetuneManager
from alphadia_tpu.models.property_models import encode_sequences
from alphadia_tpu.outputs.transfer_library import accumulate_transfer_library


def _peptides(n, rng):
    from alphadia_tpu.models.prediction import RT_COEFF

    aas = list(RT_COEFF.keys())[:20]
    seqs = ["".join(rng.choice(aas, rng.integers(7, 20))) for _ in range(n)]
    # ground-truth rt: hydrophobicity + noise
    rts = np.array(
        [sum(RT_COEFF[a] for a in s) / 50 for s in seqs], dtype=np.float32
    )
    rts = (rts - rts.min()) / (rts.max() - rts.min())
    return seqs, rts + rng.normal(0, 0.01, n).astype(np.float32)


def test_encode_sequences():
    tokens, mod_mass = encode_sequences(
        ["PEPTIDE", "ACK"], ["Carbamidomethyl@C", ""], ["2", ""]
    )
    assert tokens.shape == (2, 35)
    assert (tokens[0, :7] > 0).all() and (tokens[0, 7:] == 0).all()
    assert mod_mass[0, 1] > 0  # mod applied at position 2 of first sequence
    assert mod_mass[1].sum() == 0


def test_finetune_rt_learns(rng):
    seqs, rts = _peptides(600, rng)
    df = pd.DataFrame(
        {"sequence": seqs, "mods": "", "mod_sites": "", "rt_norm": rts}
    )
    mgr = FinetuneManager({"epochs": 30, "batch_size": 256})
    metrics = mgr.finetune_rt(df)
    assert metrics["r2"] > 0.7, metrics
    # predictions usable + model roundtrip
    pred = mgr.predict_rt(seqs[:10])
    assert pred.shape == (10,)


def test_finetune_charge(rng):
    seqs, _ = _peptides(300, rng)
    rows = []
    for i, s in enumerate(seqs):
        # charge correlates with K/R count (physically motivated)
        z = 2 + min(sum(a in "KR" for a in s), 2)
        rows.append({"sequence": s, "mods": "", "mod_sites": "", "charge": z, "mod_seq_hash": i})
    df = pd.DataFrame(rows)
    mgr = FinetuneManager({"epochs": 15, "batch_size": 128})
    metrics = mgr.finetune_charge(df)
    assert metrics["accuracy"] > 0.7


def test_finetune_ms2_and_roundtrip(tmp_path, rng):
    seqs, _ = _peptides(150, rng)
    psm = pd.DataFrame(
        {
            "sequence": seqs,
            "mods": "",
            "mod_sites": "",
            "charge": 2,
            "precursor_idx": np.arange(len(seqs)),
        }
    )
    frag_rows = []
    for i, s in enumerate(seqs):
        for pos in range(min(len(s) - 1, 8)):
            frag_rows.append(
                {
                    "precursor_idx": i,
                    "type": 121,
                    "charge": 1,
                    "position": pos,
                    "intensity": np.exp(-0.3 * abs(pos - len(s) / 2)),
                }
            )
    frag = pd.DataFrame(frag_rows)
    mgr = FinetuneManager({"epochs": 8, "batch_size": 64})
    metrics = mgr.finetune_ms2(psm, frag)
    assert metrics["spectral_angle"] > 0.3

    mgr.save(tmp_path / "model")
    mgr2 = FinetuneManager.load(tmp_path / "model")
    p1 = mgr.predict_ms2(seqs[:5], [""] * 5, [""] * 5, np.full(5, 2))
    p2 = mgr2.predict_ms2(seqs[:5], [""] * 5, [""] * 5, np.full(5, 2))
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_accumulate_transfer_library(tmp_path, rng):
    # two fake runs with psm/frag parquet
    for run_i in range(2):
        d = tmp_path / f"run_{run_i}"
        d.mkdir()
        n = 50
        psm = pd.DataFrame(
            {
                "precursor_idx": np.arange(n),
                "mod_seq_charge_hash": np.arange(n),
                "sequence": ["PEPTIDEK"] * n,
                "mods": "",
                "mod_sites": "",
                "charge": 2,
                "decoy": 0,
                "proba": rng.uniform(0, 0.1, n),
                "rt_observed": rng.uniform(100, 1000, n).astype(np.float32),
                "rt_library": rng.uniform(100, 1000, n).astype(np.float32),
                "mz_observed": rng.uniform(400, 900, n).astype(np.float32),
                "mz_library": rng.uniform(400, 900, n).astype(np.float32),
            }
        )
        frag = pd.DataFrame(
            {
                "precursor_idx": np.repeat(np.arange(n), 3),
                "type": 121,
                "charge": 1,
                "position": np.tile([1, 2, 3], n),
                "intensity": rng.uniform(10, 100, 3 * n),
                "correlation": rng.uniform(0.4, 1.0, 3 * n),
            }
        )
        psm.to_parquet(d / "psm.parquet")
        frag.to_parquet(d / "frag.parquet")

    psm, frag = accumulate_transfer_library(
        [tmp_path / "run_0", tmp_path / "run_1"], top_k_samples=1
    )
    assert len(psm) > 0
    assert "rt_norm" in psm.columns
    assert psm["rt_norm"].between(0, 1).all()
    # QC: kept fragments have correlation >= ratio * median
    assert (frag["correlation"] >= 0.75 * frag["corr_median"] - 1e-9).all()
    # top_k_samples=1: one run per precursor hash
    assert psm.groupby("mod_seq_charge_hash").size().max() == 1


def test_scan_and_loop_strategies_train_identically(rng):
    """The per-epoch lax.scan (accelerators) and the eager per-batch loop
    (CPU) must be numerically equivalent."""
    import numpy as np

    seqs, rts = _peptides(150, rng)
    df = pd.DataFrame(
        {"sequence": seqs, "mods": "", "mod_sites": "", "rt_norm": rts}
    )
    preds = {}
    for strategy in (False, True):
        mgr = FinetuneManager({"epochs": 3, "batch_size": 64}, random_state=4)
        mgr.trainer.force_scan = strategy
        mgr.finetune_rt(df)
        preds[strategy] = mgr.predict_rt(seqs[:20])
    np.testing.assert_allclose(preds[False], preds[True], atol=1e-5)
