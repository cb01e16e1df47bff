"""Peptide physics world + packaged property models.

Covers: determinism of the physics ground truth, the chemistry rules it
encodes (proline/aspartate effects, basic-residue charge), and that the
PACKAGED pretrained models (constants/weights/peptdeep_default) load by
default and out-predict the hand-written heuristics on physics truth.
"""

import numpy as np
import pytest

from alphadia_tpu.testing.physics import FRAG_COLS, PeptidePhysics

SEQS = ["ALVEYLNK", "GDFEEIPEEYLQGGGSK", "MKWVTFISLLFLFSSAYSR", "PEPTIDER"]


def test_physics_deterministic():
    a, b = PeptidePhysics(), PeptidePhysics()
    np.testing.assert_array_equal(a.rt_norm(SEQS), b.rt_norm(SEQS))
    np.testing.assert_array_equal(
        a.ms2_matrix("ALVEYLNK", 2), b.ms2_matrix("ALVEYLNK", 2)
    )
    # different world seed -> different truth
    c = PeptidePhysics(seed=7)
    assert not np.allclose(a.rt_norm(SEQS), c.rt_norm(SEQS))


def test_physics_chemistry_rules():
    p = PeptidePhysics()
    # proline effect: y enhanced at the site N-terminal to P
    seq = "ALVEAPGLNK"  # P at index 5 -> site 4
    mat = p.ms2_matrix(seq, 2)
    y = mat[:, FRAG_COLS.index("y_z1")]
    others = np.delete(y, 4)
    assert y[4] > np.median(others[others > 0])
    # charge states follow basic residue count
    probs = p.charge_probs(["AAAAAAK", "RHKRHKAAAR"])
    assert probs[0].argmax() < probs[1].argmax()
    # mobility grows with mass, falls with charge
    m1 = p.mobility(["AAAAAAK"], [2])[0]
    m2 = p.mobility(["AAAAAAKAAAAAAKAAAAAAK"], [2])[0]
    m3 = p.mobility(["AAAAAAKAAAAAAKAAAAAAK"], [3])[0]
    assert m2 > m1 and m3 < m2


def test_packaged_models_load_and_beat_heuristic():
    from pathlib import Path

    import alphadia_tpu
    from alphadia_tpu.models.prediction import SimplePrediction, predict_rt_norm

    packaged = (
        Path(alphadia_tpu.__file__).parent
        / "constants" / "weights" / "peptdeep_default" / "models.pkl"
    )
    assert packaged.exists(), "pretrained property models not shipped"

    mgr = SimplePrediction()._load_manager()
    assert mgr is not None and "rt" in mgr.variables and "ms2" in mgr.variables

    # a world seed the packaged models never saw (train: 2026/3571/9110)
    # — asserts cross-world transfer of the learned chemistry
    physics = PeptidePhysics(seed=555)
    rng = np.random.default_rng(123)
    aa = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    seqs = [
        "".join(rng.choice(aa, size=rng.integers(7, 25))) + "K" for _ in range(300)
    ]
    truth = physics.rt_norm(seqs)
    model_pred = mgr.predict_rt(seqs)
    heur_pred = predict_rt_norm(seqs)

    def r2(t, p):
        return 1 - ((t - p) ** 2).sum() / max(((t - t.mean()) ** 2).sum(), 1e-9)

    assert r2(truth, model_pred) > r2(truth, heur_pred) + 0.1
    assert r2(truth, model_pred) > 0.9


def test_batched_prediction_equals_unbatched():
    """Chunked fixed-shape inference (FinetuneManager._batched) must give
    identical results to one whole-input apply."""
    import numpy as np

    from pathlib import Path

    import alphadia_tpu
    from alphadia_tpu.models.finetune import FinetuneManager

    mgr = FinetuneManager.load(
        Path(alphadia_tpu.__file__).parent
        / "constants" / "weights" / "peptdeep_default"
    )
    rng = np.random.default_rng(5)
    aas = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    seqs = [
        "".join(rng.choice(aas, rng.integers(7, 25))) + "K" for _ in range(50)
    ]
    charges = rng.integers(2, 4, len(seqs))

    full_rt = mgr.predict_rt(seqs)
    full_ms2 = mgr.predict_ms2(seqs, None, None, charges)
    mgr_small = FinetuneManager.load(
        Path(alphadia_tpu.__file__).parent
        / "constants" / "weights" / "peptdeep_default"
    )
    mgr_small.PREDICT_BATCH = 16  # force chunking + tail padding
    np.testing.assert_allclose(mgr_small.predict_rt(seqs), full_rt, rtol=1e-5)
    np.testing.assert_allclose(
        mgr_small.predict_ms2(seqs, None, None, charges), full_ms2, rtol=1e-5
    )
    np.testing.assert_allclose(
        mgr_small.predict_charge(seqs), mgr.predict_charge(seqs), rtol=1e-5
    )
