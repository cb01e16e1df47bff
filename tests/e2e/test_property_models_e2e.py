"""Pretrained property models e2e: library-free search must approach
library-based IDs on a physics-grounded world.

The acquisition is planted from a TRUTH library whose RT and fragment
intensities come from the seeded peptide-physics world
(testing/physics.py) — sequence-determined, unknown to the predictors.
Arm A searches with the truth library (upper bound); arm B runs the
library-free FASTA branch, which predicts RT/MS2 with the PACKAGED
pretrained models (constants/weights/peptdeep_default). The packaged
models were trained on random peptides in DIFFERENT world seeds
(2026/3571/9110) — this acquisition's world (seed 7311) and its protein
sequences are both unseen, so the gate measures cross-world
generalization of the learned chemistry.

(reference analog: library-free search powered by pretrained peptdeep
models, alphadia/libtransform/prediction.py:14-90.)
"""

import json

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.library.decoy import DecoyGenerator
from alphadia_tpu.library.digest import digest_fasta
from alphadia_tpu.library.flatten import FlattenLibrary, InitFlatColumns
from alphadia_tpu.library.harmonize import IsotopeGenerator, PrecursorInitializer
from alphadia_tpu.models.prediction import SimplePrediction
from alphadia_tpu.testing.mzml_writer import write_mzml
from alphadia_tpu.testing.physics import FRAG_COLS, PeptidePhysics
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_run_from_library

_FASTA = """>sp|P001|PROT1 GN=G1
MKWVTFISLLFLFSSAYSRGVFRRDAHKSEVAHRFKDLGEENFKALVLIAFAQYLQQCPFEDHVKLVNEVTEFAK
>sp|P002|PROT2 GN=G2
MTEYKLVVVGAGGVGKSALTIQLIQNHFVDEYDPTIEDSYRKQVVIDGETCLLDILDTAGQEEYSAMRDQYMRTGEGFLCVFAINNTK
>sp|P003|PROT3 GN=G3
MGLSDGEWQLVLNVWGKVEADIPGHGQEVLIRLFKGHPETLEKFDKFKHLKSEDEMKASEDLKKHGATVLTALGGILKKKGHHEAEIKPLAQSHATK
>sp|P004|PROT4 GN=G4
MSKGEELFTGVVPILVELDGDVNGHKFSVSGEGEGDATYGKLTLKFICTTGKLPVPWPTLVTTFSYGVQCFSR
>sp|P005|PROT5 GN=G5
MAHHHHHHVGTGSNITEEQLDAIAKELSERLDVAQESIRLAKEVANETKTAEDKLNALQDKLSALQAELAEAQK
>sp|P006|PROT6 GN=G6
MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVKALPDAQFEVVHSLAK
>sp|P007|PROT7 GN=G7
MNIFEMLRIDEGLRLKIYKDTEGYYTIGIGHLLTKSPSLNAAKSELDKAIGRNTNGVITKDEAEKLFNQDVDAAVRGILRNAK
>sp|P008|PROT8 GN=G8
MQIFVKTLTGKTITLEVEPSDTIENVKAKIQDKEGIPPDQQRLIFAGKQLEDGRTLSDYNIQKESTLHLVLRLRGG
"""

# a world seed the packaged models were NEVER trained or gated on
# (train seeds 2026/3571/9110, training-script eval seed 4053 — see
# scripts/train_property_models.py) so recovery here measures
# generalization to fresh chemistry, not memorization of the world
_PHYSICS = PeptidePhysics(seed=7311)


def _truth_library():
    """Digest + structure, then overwrite RT/MS2 with physics truth."""
    lib = digest_fasta([_FASTA_PATH], missed_cleavages=1)
    lib = PrecursorInitializer()(lib)
    lib = SimplePrediction()(lib)  # builds fragment m/z structure
    df = lib.precursor_df
    df["rt_norm"] = _PHYSICS.rt_norm(df["sequence"].tolist())
    cols = list(lib.fragment_intensity_df.columns)
    inten = lib.fragment_intensity_df.to_numpy().copy()
    for seq, z, a, b in zip(
        df["sequence"], df["charge"], df["frag_start_idx"], df["frag_stop_idx"]
    ):
        mat = _PHYSICS.ms2_matrix(str(seq), int(z))
        block = np.zeros((int(b) - int(a), len(cols)), np.float32)
        for j, c in enumerate(cols):
            if c in FRAG_COLS:
                src = FRAG_COLS.index(c)
                n = min(len(mat), len(block))
                block[:n, j] = mat[:n, src]
        inten[int(a) : int(b)] = block
    lib.fragment_intensity_df = pd.DataFrame(inten, columns=cols)
    lib = IsotopeGenerator()(lib)
    return lib


_FASTA_PATH = None


@pytest.mark.slow
def test_library_free_matches_library_based(tmp_path):
    global _FASTA_PATH
    fasta = tmp_path / "physics.fasta"
    fasta.write_text(_FASTA)
    _FASTA_PATH = str(fasta)

    lib = _truth_library()

    # plant the acquisition from the physics truth (targets only)
    flat_truth = InitFlatColumns()(FlattenLibrary()(lib.copy()))
    cfg = SyntheticConfig(
        n_windows=6, n_cycles=350, noise_peaks_per_spectrum=40, seed=5,
        detectable_fraction=0.9,
    )
    spectra = make_run_from_library(
        flat_truth.precursor_df, flat_truth.fragment_df, cfg
    )
    raw = tmp_path / "run.mzML"
    write_mzml(raw, spectra)

    # library-based arm: truth library + decoys, flat HDF
    decoyed = DecoyGenerator("diann")(lib.copy())
    flat = InitFlatColumns()(FlattenLibrary()(decoyed))
    lib_path = tmp_path / "truth.hdf"
    flat.save_hdf(lib_path)

    from alphadia_tpu.cli import run

    overrides = {
        "general": {"random_state": 9, "save_figures": False},
        "calibration": {
            "batch_size": 200,
            "optimization_lock_target": 30,
            "min_steps": 2,
            "max_steps": 5,
        },
        "search": {
            "target_ms1_tolerance": 10,
            "target_ms2_tolerance": 12,
            "target_rt_tolerance": 60,
        },
        "search_initial": {"rt_tolerance": 0.5},
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }

    out_lib = tmp_path / "out_lib"
    run(["-o", str(out_lib), "-f", str(raw), "-l", str(lib_path),
         "--config-dict", json.dumps(overrides)])
    ids_lib = pd.read_parquet(out_lib / "precursors.parquet")

    overrides["library_prediction"] = {"enabled": True, "missed_cleavages": 1}
    out_free = tmp_path / "out_free"
    run(["-o", str(out_free), "-f", str(raw), "--fasta", str(fasta),
         "--config-dict", json.dumps(overrides)])
    ids_free = pd.read_parquet(out_free / "precursors.parquet")

    seq_lib = set(ids_lib["precursor.sequence"])
    seq_free = set(ids_free["precursor.sequence"])
    assert len(ids_lib) > 20, f"library-based arm found only {len(ids_lib)}"
    # pretrained models must reach within 15% of the library-grade IDs
    # ON A WORLD THEY NEVER SAW (margin covers run-to-run jitter only)
    ratio = len(seq_free) / max(len(seq_lib), 1)
    print(f"\ncross-world library-free ratio {ratio:.3f} "
          f"({len(seq_free)}/{len(seq_lib)} sequences)")
    assert ratio > 0.85, (
        f"library-free {len(seq_free)} vs library-based {len(seq_lib)} "
        f"sequences (ratio {ratio:.2f})"
    )
    # and the two arms agree on what they found
    overlap = len(seq_free & seq_lib) / max(len(seq_free), 1)
    assert overlap > 0.9, f"only {overlap:.2f} of library-free IDs overlap"
