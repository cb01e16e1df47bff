"""Transfer-requant numerical properties (reference:
transfer_library_requantification_handler.py:26-137).

The multistep e2e proves the plumbing; this test pins the semantics on a
SEQUENCE-CONSISTENT world (physics-grounded library, fragments at their
true sequence-derived m/z): the regenerated fragment space is the FULL
configured type/charge space (not the scored top-k), psm rows re-index
onto a partition of the new fragment table, and requantified intensities
correlate with the planted physics MS2 pattern.
"""

import numpy as np
import pytest

from alphadia_tpu.library.decoy import DecoyGenerator
from alphadia_tpu.library.digest import digest_fasta
from alphadia_tpu.library.flatten import FlattenLibrary, InitFlatColumns
from alphadia_tpu.library.harmonize import IsotopeGenerator, PrecursorInitializer
from alphadia_tpu.models.prediction import SimplePrediction
from alphadia_tpu.rawdata.source import save_npz
from alphadia_tpu.testing.physics import FRAG_COLS, PeptidePhysics
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_run_from_library
from alphadia_tpu.workflow.peptidecentric.peptidecentric import (
    PeptideCentricWorkflow,
)
from test_workflow import _test_config

_FASTA = """>sp|P001|PROT1 GN=G1
MKWVTFISLLFLFSSAYSRGVFRRDAHKSEVAHRFKDLGEENFKALVLIAFAQYLQQCPFEDHVKLVNEVTEFAK
>sp|P002|PROT2 GN=G2
MTEYKLVVVGAGGVGKSALTIQLIQNHFVDEYDPTIEDSYRKQVVIDGETCLLDILDTAGQEEYSAMRDQYMRTGEGFLCVFAINNTK
>sp|P003|PROT3 GN=G3
MGLSDGEWQLVLNVWGKVEADIPGHGQEVLIRLFKGHPETLEKFDKFKHLKSEDEMKASEDLKKHGATVLTALGGILKKKGHHEAEIKPLAQSHATK
>sp|P004|PROT4 GN=G4
MSKGEELFTGVVPILVELDGDVNGHKFSVSGEGEGDATYGKLTLKFICTTGKLPVPWPTLVTTFSYGVQCFSR
"""


def _physics_flat_library(tmp_path):
    physics = PeptidePhysics()
    fasta = tmp_path / "physics.fasta"
    fasta.write_text(_FASTA)
    lib = digest_fasta([str(fasta)], missed_cleavages=1)
    lib = PrecursorInitializer()(lib)
    lib = SimplePrediction()(lib)  # builds the fragment m/z structure
    df = lib.precursor_df
    df["rt_norm"] = physics.rt_norm(df["sequence"].tolist())
    cols = list(lib.fragment_intensity_df.columns)
    inten = lib.fragment_intensity_df.to_numpy().copy()
    for seq, z, a, b in zip(
        df["sequence"], df["charge"], df["frag_start_idx"], df["frag_stop_idx"]
    ):
        mat = physics.ms2_matrix(str(seq), int(z))
        block = np.zeros((int(b) - int(a), len(cols)), np.float32)
        for j, c in enumerate(cols):
            if c in FRAG_COLS:
                src = FRAG_COLS.index(c)
                n = min(len(mat), len(block))
                block[:n, j] = mat[:n, src]
        inten[int(a) : int(b)] = block
    import pandas as pd

    lib.fragment_intensity_df = pd.DataFrame(inten, columns=cols)
    lib = IsotopeGenerator()(lib)
    truth_flat = InitFlatColumns()(FlattenLibrary()(lib.copy()))
    decoyed_flat = InitFlatColumns()(FlattenLibrary()(DecoyGenerator("diann")(lib)))
    return physics, truth_flat, decoyed_flat


@pytest.mark.slow
def test_requantify_full_fragment_space(tmp_path):
    physics, truth_flat, flat = _physics_flat_library(tmp_path)
    spectra = make_run_from_library(
        truth_flat.precursor_df,
        truth_flat.fragment_df,
        SyntheticConfig(
            n_windows=6, n_cycles=300, noise_peaks_per_spectrum=40, seed=5,
            detectable_fraction=0.9,
        ),
    )
    raw_path = tmp_path / "run.npz"
    save_npz(raw_path, spectra)

    cfg = _test_config(tmp_path)
    cfg.update_layer(
        {
            "general": {"input_library_type": "flat"},
            "search": {"target_rt_tolerance": 60},
            "search_initial": {"rt_tolerance": 0.5},
            "calibration": {"optimization_lock_target": 30},
            "transfer_library": {"enabled": True, "fragment_types": ["b", "y"],
                                 "max_charge": 2},
        },
        name="requant",
    )
    wf = PeptideCentricWorkflow("physics", cfg)
    wf.load(str(raw_path), flat)
    wf.search_parameter_optimization()
    psm_df, frag_scored = wf.extraction()
    assert len(psm_df) > 30

    requant_psm, requant_frag = wf.requantify_fragments(psm_df)
    assert requant_psm.duplicated(["precursor_idx", "rank"]).sum() == 0

    # FULL b/y space up to charge 2 is far larger than the scored top-12
    per_prec_scored = frag_scored.groupby("precursor_idx").size()
    per_prec_requant = requant_frag.groupby("precursor_idx").size()
    common = per_prec_scored.index.intersection(per_prec_requant.index)
    assert len(common) > 10
    assert (
        per_prec_requant.loc[common].median()
        > 1.5 * per_prec_scored.loc[common].median()
    ), "requant space not larger than scored top-k"

    # flat indices partition the fragment table
    starts = requant_psm["flat_frag_start_idx"].to_numpy()
    stops = requant_psm["flat_frag_stop_idx"].to_numpy()
    assert (stops >= starts).all()
    order = np.argsort(starts)
    s, e = starts[order], stops[order]
    nonempty = e > s
    assert (s[nonempty][1:] >= e[nonempty][:-1]).all(), "overlapping slices"
    assert e.max() <= len(requant_frag)
    fp = requant_frag["precursor_idx"].to_numpy()
    for row in requant_psm.iloc[:20].itertuples():
        sl = fp[row.flat_frag_start_idx : row.flat_frag_stop_idx]
        assert (sl == row.precursor_idx).all()

    # requantified intensities track the planted physics MS2 pattern
    prec_df = flat.precursor_df.set_index("precursor_idx")
    corrs = []
    for pidx in list(common)[:40]:
        sub = requant_frag[requant_frag["precursor_idx"] == pidx]
        if len(sub) < 6:
            continue
        seq = str(prec_df.loc[pidx, "sequence"])
        z = int(prec_df.loc[pidx, "charge"])
        mat = physics.ms2_matrix(seq, z)  # [n_sites, FRAG_COLS]
        col_of = {
            (ord(c.split("_z")[0]), int(c.split("_z")[1])): j
            for j, c in enumerate(FRAG_COLS)
        }
        truth_int = np.array(
            [
                mat[int(p), col_of[(int(t), int(c))]]
                if (int(t), int(c)) in col_of and int(p) < len(mat)
                else 0.0
                for p, t, c in zip(sub["position"], sub["type"], sub["charge"])
            ]
        )
        obs = sub["intensity"].to_numpy()
        if truth_int.std() > 0 and obs.std() > 0:
            corrs.append(np.corrcoef(truth_int, obs)[0, 1])
    assert len(corrs) > 8, f"only {len(corrs)} precursors comparable"
    assert np.median(corrs) > 0.5, f"median corr {np.median(corrs):.2f}"
