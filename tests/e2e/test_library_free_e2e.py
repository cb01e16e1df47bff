"""Library-free e2e: FASTA digest + prediction -> synthetic mzML -> CLI search.

Drives the full library-free branch: digest, baseline property prediction,
DIANN decoys, flatten, mzML ingestion, optimization loop, FDR, outputs —
the `astral`/library-free analog of the reference e2e cases.
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
"""


@pytest.mark.slow
def test_library_free_search(tmp_path):
    fasta = tmp_path / "test.fasta"
    fasta.write_text(_FASTA)

    # build the "true" library to plant peptides into the acquisition
    lib = digest_fasta([str(fasta)], missed_cleavages=1)
    lib = PrecursorInitializer()(lib)
    lib = SimplePrediction()(lib)
    lib = IsotopeGenerator()(lib)
    flat = InitFlatColumns()(FlattenLibrary()(lib))
    assert flat.n_precursors > 30

    cfg = SyntheticConfig(
        n_windows=6, n_cycles=350, noise_peaks_per_spectrum=40, seed=5,
        detectable_fraction=0.9,
    )
    spectra = make_run_from_library(flat.precursor_df, flat.fragment_df, cfg)
    raw = tmp_path / "run.mzML"
    write_mzml(raw, spectra)

    from alphadia_tpu.cli import run

    overrides = {
        "general": {"random_state": 9, "save_figures": False},
        "library_prediction": {"enabled": True, "missed_cleavages": 1},
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
    out_dir = tmp_path / "out"
    run(
        [
            "-o", str(out_dir),
            "-f", str(raw),
            "--fasta", str(fasta),
            "--config-dict", json.dumps(overrides),
        ]
    )

    psm = pd.read_parquet(out_dir / "precursors.parquet")
    assert len(psm) > 10, f"only {len(psm)} identifications"
    # identified sequences are real tryptic peptides from the FASTA
    seqs = set(psm["precursor.sequence"])
    digest_seqs = set(flat.precursor_df["sequence"])
    assert seqs <= digest_seqs
    # protein annotation survived to protein groups
    assert psm["pg.name"].notna().all()
