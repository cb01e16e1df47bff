"""Dimethyl multiplexing e2e: 2-channel acquisition -> channel requant.

Mirrors the reference's dimethyl `multistep` e2e case at synthetic scale
(reference: e2e_test_cases.yaml `multistep`; machinery:
alphadia/libtransform/multiplex.py + multiplexing_requantification_handler).

A base library carries fixed light dimethyl on K and every N-terminus.
The engine expands it to channels 0 (light), 4 (Dimethyl:2H(4)) and the
never-planted decoy channel 12 (Dimethyl:2H(6)) via
`library_multiplexing.multiplex_mapping` — all label chemistry resolved
from the generated UniMod table. The planted acquisition contains
channels 0 and 4 (channel 4 at half intensity); requantification must
recover BOTH planted channels at confident q-values while the decoy
channel stays at the null.
"""

import json

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.library.digest import digest_fasta
from alphadia_tpu.library.flatten import FlattenLibrary, InitFlatColumns
from alphadia_tpu.library.harmonize import IsotopeGenerator, PrecursorInitializer
from alphadia_tpu.library.multiplex import MultiplexLibrary
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
"""

_LIGHT = {"Dimethyl@K": "Dimethyl@K", "Dimethyl@Any_N-term": "Dimethyl@Any_N-term"}
_MEDIUM = {
    "Dimethyl@K": "Dimethyl:2H(4)@K",
    "Dimethyl@Any_N-term": "Dimethyl:2H(4)@Any_N-term",
}
_HEAVY = {  # decoy channel label — never planted
    "Dimethyl@K": "Dimethyl:2H(6)@K",
    "Dimethyl@Any_N-term": "Dimethyl:2H(6)@Any_N-term",
}
_MAPPING = [
    {"channel_name": 0, "modifications": {}},
    {"channel_name": 4, "modifications": _MEDIUM},
    {"channel_name": 12, "modifications": _HEAVY},
]


@pytest.mark.slow
def test_dimethyl_two_channel_requant(tmp_path):
    fasta = tmp_path / "t.fasta"
    fasta.write_text(_FASTA)

    base = digest_fasta(
        [str(fasta)],
        missed_cleavages=0,
        fixed_modifications="Dimethyl@K;Dimethyl@Any_N-term",
        variable_modifications="",
    )
    base = PrecursorInitializer()(base)
    base = SimplePrediction()(base)
    base = IsotopeGenerator()(base)

    # planted truth: channels 0 + 4 only (channel 12 stays empty = null)
    truth = MultiplexLibrary(_MAPPING[:2])(base.copy())
    flat = InitFlatColumns()(FlattenLibrary()(truth))
    prec, frag = flat.precursor_df, flat.fragment_df
    ch4 = prec["channel"].to_numpy() == 4
    scale = np.ones(len(prec), np.float32)
    scale[ch4] = 0.5  # planted 2:1 light:medium ratio
    frag = frag.copy()
    for _, r in prec.iterrows():
        s = scale[int(r.name)]
        if s != 1.0:
            frag.loc[int(r.frag_start_idx) : int(r.frag_stop_idx) - 1, "intensity"] *= s

    spectra = make_run_from_library(
        prec, frag,
        SyntheticConfig(
            n_windows=6, n_cycles=350, noise_peaks_per_spectrum=30, seed=9,
            detectable_fraction=1.0,
        ),
    )
    raw = tmp_path / "run.mzML"
    write_mzml(raw, spectra)

    lib_path = tmp_path / "base.hdf"
    base.save_hdf(lib_path)

    from alphadia_tpu.cli import run

    overrides = {
        "general": {"random_state": 4, "save_figures": False},
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
        "library_multiplexing": {
            "enabled": True,
            "input_channel": 0,
            "multiplex_mapping": _MAPPING,
        },
        "multiplexing": {
            "enabled": True,
            "target_channels": "0,4",
            "decoy_channel": 12,
            "reference_channel": 0,
        },
        "fdr": {"keep_decoys": False},
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }
    out_dir = tmp_path / "out"
    run(["-o", str(out_dir), "-f", str(raw), "-l", str(lib_path),
         "--config-dict", json.dumps(overrides)])

    psm = pd.read_parquet(out_dir / "precursors.parquet")
    assert "precursor.channel" in psm.columns
    by_channel = psm.groupby("precursor.channel").size().to_dict()
    print(f"\nIDs per channel: {by_channel}")

    n0 = by_channel.get(0, 0)
    n4 = by_channel.get(4, 0)
    n12 = by_channel.get(12, 0)
    assert n0 > 15, f"too few light-channel IDs ({n0})"
    # the planted medium channel must requantify at confident q-values
    assert n4 > 0.5 * n0, f"medium channel under-recovered: {n4} vs {n0}"
    # the never-planted decoy channel is the null: (near-)zero discoveries
    assert n12 <= max(1, 0.05 * n0), f"decoy channel leaked {n12} IDs"

    # channel copies agree on the underlying peptides
    seq0 = set(psm.loc[psm["precursor.channel"] == 0, "precursor.sequence"])
    seq4 = set(psm.loc[psm["precursor.channel"] == 4, "precursor.sequence"])
    assert len(seq4 & seq0) / max(len(seq4), 1) > 0.8
