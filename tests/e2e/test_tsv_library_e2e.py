"""TSV transition-list e2e: DIA-NN-style long-format library -> CLI search.

Regression test for the TSV loading path (library/loader.py
``load_speclib_tsv``): round-trips a digested+predicted library through a
long-format transition list with UniMod-annotated modified peptides, plants
the same library into a synthetic mzML, and runs the full CLI search. Covers
what the flat-HDF and library-free e2e tests do not: ModifiedPeptide
parsing, fragment matrix reconstruction from long format, and the
harmonize steps applied to externally loaded libraries.
"""

import json

import pandas as pd
import pytest

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
"""

_UNIMOD = {"Carbamidomethyl": 4, "Oxidation": 35, "Acetyl": 1}


def _modified_peptide(row) -> str:
    """alphabase (mods, mod_sites) -> DIA-NN '_SEQ(UniMod:N)_' notation."""
    seq = row.sequence
    if not row.mods:
        return f"_{seq}_"
    mods = str(row.mods).split(";")
    sites = [int(x) for x in str(row.mod_sites).split(";")]
    out = list(seq)
    for m, s in sorted(zip(mods, sites), key=lambda t: -t[1]):
        out.insert(max(s, 0), f"(UniMod:{_UNIMOD[m.split('@')[0]]})")
    return "_" + "".join(out) + "_"


def _write_transition_list(lib, path) -> int:
    mz = lib.fragment_mz_df.to_numpy()
    inten = lib.fragment_intensity_df.to_numpy()
    cols = list(lib.fragment_mz_df.columns)
    rows = []
    for _, r in lib.precursor_df.iterrows():
        mp = _modified_peptide(r)
        naa = len(r.sequence)
        for fi in range(int(r.frag_start_idx), int(r.frag_stop_idx)):
            num = fi - int(r.frag_start_idx) + 1  # b number; y = naa - num
            for ci, cname in enumerate(cols):
                m, it = mz[fi, ci], inten[fi, ci]
                if m <= 0 or it <= 0.001:
                    continue
                ftype, fz = cname.split("_z")
                rows.append(
                    dict(
                        ModifiedPeptide=mp,
                        StrippedPeptide=r.sequence,
                        PrecursorCharge=int(r.charge),
                        PrecursorMz=float(r.precursor_mz),
                        Tr_recalibrated=float(r.rt_norm),
                        ProteinGroups=r.get("proteins", ""),
                        Genes=r.get("genes", ""),
                        FragmentMz=float(m),
                        RelativeIntensity=float(it),
                        FragmentType=ftype,
                        FragmentCharge=int(fz),
                        FragmentSeriesNumber=int(num if ftype == "b" else naa - num),
                    )
                )
    df = pd.DataFrame(rows)
    df.to_csv(path, sep="\t", index=False)
    return df.groupby(["ModifiedPeptide", "PrecursorCharge"]).ngroups


@pytest.mark.slow
def test_tsv_transition_list_search(tmp_path):
    fasta = tmp_path / "t.fasta"
    fasta.write_text(_FASTA)

    lib = digest_fasta([str(fasta)], missed_cleavages=1)
    lib = PrecursorInitializer()(lib)
    lib = SimplePrediction()(lib)
    lib = IsotopeGenerator()(lib)

    tsv = tmp_path / "library.tsv"
    n_groups = _write_transition_list(lib, tsv)
    # no precursor collapse: every (modified sequence, charge) kept distinct
    assert n_groups == len(lib.precursor_df)

    flat = InitFlatColumns()(FlattenLibrary()(lib.copy()))
    spectra = make_run_from_library(
        flat.precursor_df,
        flat.fragment_df,
        SyntheticConfig(
            n_windows=6, n_cycles=350, noise_peaks_per_spectrum=40, seed=5,
            detectable_fraction=0.9,
        ),
    )
    raw = tmp_path / "run.mzML"
    write_mzml(raw, spectra)

    from alphadia_tpu.cli import run

    overrides = {
        "general": {"random_state": 5, "save_figures": False},
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
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }
    out_dir = tmp_path / "out"
    run(
        [
            "-o", str(out_dir),
            "-f", str(raw),
            "-l", str(tsv),
            "--config-dict", json.dumps(overrides),
        ]
    )

    psm = pd.read_parquet(out_dir / "precursors.parquet")
    assert len(psm) > 20, f"only {len(psm)} identifications from TSV library"
    # every identified sequence is a real digest peptide
    assert set(psm["precursor.sequence"]) <= set(lib.precursor_df["sequence"])
    assert psm["pg.name"].notna().all()


@pytest.mark.slow
def test_phospho_tmt_tsv_library_search(tmp_path):
    """Mod-heavy library: fixed TMTpro on K + every N-terminus, variable
    Phospho on S — all resolved from the generated UniMod table
    (constants/unimod_common.tsv) with no manual registration.

    (reference analog: alphabase's bundled UniMod table powering
    mod-heavy libraries through alphadia/libtransform/.)
    """
    _UNIMOD.update({"Phospho": 21, "TMTpro": 2016})

    fasta = tmp_path / "t.fasta"
    fasta.write_text(_FASTA)

    lib = digest_fasta(
        [str(fasta)],
        missed_cleavages=0,
        fixed_modifications="Carbamidomethyl@C;TMTpro@K;TMTpro@Any_N-term",
        variable_modifications="Phospho@S",
        max_var_mod_num=1,
    )
    lib = PrecursorInitializer()(lib)
    lib = SimplePrediction()(lib)
    lib = IsotopeGenerator()(lib)
    prec = lib.precursor_df
    assert prec["mods"].str.contains("TMTpro").all(), "fixed TMT not applied"
    assert prec["mods"].str.contains("Phospho").any(), "no phospho forms"

    tsv = tmp_path / "library.tsv"
    n_groups = _write_transition_list(lib, tsv)
    assert n_groups == len(prec)

    flat = InitFlatColumns()(FlattenLibrary()(lib.copy()))
    spectra = make_run_from_library(
        flat.precursor_df,
        flat.fragment_df,
        SyntheticConfig(
            n_windows=6, n_cycles=350, noise_peaks_per_spectrum=40, seed=6,
            detectable_fraction=0.9,
        ),
    )
    raw = tmp_path / "run.mzML"
    write_mzml(raw, spectra)

    from alphadia_tpu.cli import run

    overrides = {
        "general": {"random_state": 6, "save_figures": False},
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
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }
    out_dir = tmp_path / "out"
    run(["-o", str(out_dir), "-f", str(raw), "-l", str(tsv),
         "--config-dict", json.dumps(overrides)])

    psm = pd.read_parquet(out_dir / "precursors.parquet")
    assert len(psm) > 20, f"only {len(psm)} IDs from phospho-TMT library"
    assert set(psm["precursor.sequence"]) <= set(prec["sequence"])
    # the mod-heavy forms themselves are identified, not just base peptides
    assert psm["precursor.mods"].str.contains("TMTpro").all()
    assert psm["precursor.mods"].str.contains("Phospho").any()
