"""Train and package the default peptide property models (RT/charge/MS2/CCS).

Role of the pretrained alphaPeptDeep models in the reference
(alphadia/libtransform/prediction.py:14-90): power library-free search.
No measured training data is reachable in this environment, so the corpus
comes from the seeded peptide-physics world
(alphadia_tpu/testing/physics.py) — sequence-determined RT, charge states,
CID fragmentation and mobility grounded in published chemistry rules plus
a random interaction table that forces the models to learn, not memorize
a formula the predictor already contains.

Gates packaging on held-out metrics: RT R^2 and MS2 spectral angle on
sequences never seen in training, compared against the shipped heuristics.

Run: python scripts/train_property_models.py
"""

import pickle
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parents[1]))

from alphadia_tpu.models.finetune import FinetuneManager, _r2, _spectral_angle
from alphadia_tpu.models.prediction import predict_rt_norm
from alphadia_tpu.testing.physics import FRAG_COLS, PeptidePhysics

_AA = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
OUT_DIR = Path(__file__).parents[1] / "alphadia_tpu" / "constants" / "weights" / "peptdeep_default"


def _tryptic_sequences(rng: np.random.Generator, n: int) -> list[str]:
    lens = rng.integers(7, 31, n)
    seqs = []
    for ln in lens:
        body = "".join(rng.choice(_AA, size=ln - 1))
        tail = rng.choice(["K", "R"]) if rng.random() < 0.9 else rng.choice(_AA)
        seqs.append(body + tail)
    return seqs


def _frame(seqs, physics: PeptidePhysics, rng) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(psm_df, frag_df) shaped for the FinetuneManager heads."""
    n = len(seqs)
    charge_p = physics.charge_probs(seqs)
    charges = np.array(
        [2 + int(np.argmax(charge_p[i, 1:4])) for i in range(n)], np.int32
    )
    psm = pd.DataFrame(
        {
            "precursor_idx": np.arange(n),
            "sequence": seqs,
            "mods": "",
            "mod_sites": "",
            "charge": charges,
            "rt_norm": physics.rt_norm(seqs),
            "mobility_observed": physics.mobility(seqs, charges),
            "mod_seq_hash": [hash(s) for s in seqs],
        }
    )
    rows = []
    for i, (s, z) in enumerate(zip(seqs, charges)):
        mat = physics.ms2_matrix(s, int(z))
        sites, cols = np.nonzero(mat > 0.01)
        for site, c in zip(sites, cols):
            t, fz = FRAG_COLS[c].split("_z")
            rows.append(
                (i, ord(t), int(fz), int(site), float(mat[site, c]))
            )
    frag = pd.DataFrame(
        rows, columns=["precursor_idx", "type", "charge", "position", "intensity"]
    )
    return psm, frag


def main() -> None:
    physics = PeptidePhysics()
    rng = np.random.default_rng(11)
    train_seqs = list(dict.fromkeys(_tryptic_sequences(rng, 30000)))
    holdout = list(dict.fromkeys(_tryptic_sequences(np.random.default_rng(99), 3000)))
    holdout = [s for s in holdout if s not in set(train_seqs)]
    print(f"{len(train_seqs)} training / {len(holdout)} held-out sequences")

    psm, frag = _frame(train_seqs, physics, rng)
    mgr = FinetuneManager(
        config={"epochs": 80, "batch_size": 1024, "max_lr": 1e-4}, random_state=0
    )
    mgr.finetune_rt(psm)
    mgr.finetune_charge(psm)
    # MS2 on a subset (dense targets are heavy); enough to learn the rules
    sub = psm.iloc[:10000]
    mgr.finetune_ms2(sub, frag[frag["precursor_idx"] < 10000])
    mgr.finetune_ccs(psm.iloc[:10000])

    # ---- held-out evaluation vs heuristics ----------------------------
    ho_psm, ho_frag = _frame(holdout, physics, rng)
    rt_true = ho_psm["rt_norm"].to_numpy()
    rt_model = mgr.predict_rt(holdout)
    rt_heur = predict_rt_norm(holdout)
    r2_model, r2_heur = _r2(rt_true, rt_model), _r2(rt_true, rt_heur)
    print(f"held-out RT R^2: model {r2_model:.3f} vs heuristic {r2_heur:.3f}")

    from alphadia_tpu.models.property_models import MAX_LEN

    pred = mgr.predict_ms2(
        holdout, [""] * len(holdout), [""] * len(holdout),
        ho_psm["charge"].to_numpy(np.int32),
    )
    target = np.zeros((len(holdout), MAX_LEN - 1, len(FRAG_COLS)), np.float32)
    for pid, g in ho_frag.groupby("precursor_idx"):
        for t, z, p, v in zip(g["type"], g["charge"], g["position"], g["intensity"]):
            c = FRAG_COLS.index(f"{chr(int(t))}_z{int(z)}")
            if p < MAX_LEN - 1:
                target[pid, int(p), c] = v
    sa = float(np.nanmean(_spectral_angle(
        pred.reshape(len(holdout), -1), target.reshape(len(holdout), -1)
    )))
    print(f"held-out MS2 spectral angle: {sa:.3f}")

    if r2_model < max(r2_heur, 0.6) or sa < 0.6:
        print("models do not beat the bar — NOT packaging")
        sys.exit(1)

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    mgr.metrics["holdout"] = {"rt_r2": r2_model, "rt_r2_heuristic": r2_heur, "ms2_sa": sa}
    mgr.save(OUT_DIR)
    print(f"saved {OUT_DIR / 'models.pkl'}")


if __name__ == "__main__":
    main()
