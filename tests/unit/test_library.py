import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.library.decoy import DecoyGenerator, _mutate_diann
from alphadia_tpu.library.digest import digest_fasta, digest_sequence, read_fasta
from alphadia_tpu.library.flatten import FlattenLibrary, InitFlatColumns
from alphadia_tpu.library.harmonize import IsotopeGenerator, PrecursorInitializer
from alphadia_tpu.library.loader import DynamicLoader, load_speclib_tsv
from alphadia_tpu.library.speclib import SpecLibBase
from alphadia_tpu.models.prediction import SimplePrediction


@pytest.fixture()
def fasta(tmp_path):
    p = tmp_path / "test.fasta"
    p.write_text(
        ">sp|P00001|PROT1_HUMAN Test protein GN=GENE1\n"
        "MKFLILLFNILCLFPVLAADNHGVGPQGASGVDPITFDINSNQTGPAFLTAVEMAGVKYLQVQHGSNVNIHRLVEGNVVIWENASTPLYTGAIVTNNDGPYMAYVEVLGDPNLQFFIK\n"
        ">sp|P00002|PROT2_HUMAN Another GN=GENE2\n"
        "MSSSSWLLLSLVAVTAAQSTIEEQAKTFLDKFNHEAEDLFYQSSLASWNYNTNITEENVQNMNNAGDKWSAFLKEQSTLAQMYPLQEIQNLTVKLQLQALQ\n"
    )
    return str(p)


def test_read_fasta(fasta):
    df = read_fasta(fasta)
    assert len(df) == 2
    assert df.protein.tolist() == ["P00001", "P00002"]
    assert df.gene.tolist() == ["GENE1", "GENE2"]


def test_digest_rules():
    peps = digest_sequence("MKFLRPAKDEMK", "trypsin", missed_cleavages=0)
    # cleave after K/R unless before P: MK | FLRPAK | DEMK (R before P blocked)
    assert "MK" in peps and "FLRPAK" in peps and "DEMK" in peps
    peps1 = digest_sequence("MKFLRPAKDEMK", "trypsin", missed_cleavages=1)
    assert "MKFLRPAK" in peps1


def test_digest_fasta_full(fasta):
    lib = digest_fasta([fasta], missed_cleavages=1)
    df = lib.precursor_df
    assert len(df) > 20
    assert (df["precursor_mz"] >= 400).all() and (df["precursor_mz"] <= 1200).all()
    assert df["sequence"].str.len().between(7, 35).all()
    # fixed mod applied on every C
    has_c = df["sequence"].str.contains("C")
    assert df.loc[has_c, "mods"].str.contains("Carbamidomethyl@C").all()
    # protein annotation present
    assert (df["proteins"] != "").all()


def _full_pipeline_lib(fasta):
    lib = digest_fasta([fasta])
    lib = PrecursorInitializer()(lib)
    lib = SimplePrediction()(lib)
    lib = IsotopeGenerator()(lib)
    lib = DecoyGenerator("diann")(lib)
    return lib


def test_decoy_generation(fasta):
    lib = _full_pipeline_lib(fasta)
    df = lib.precursor_df
    assert set(df["decoy"].unique()) == {0, 1}
    n_t, n_d = (df["decoy"] == 0).sum(), (df["decoy"] == 1).sum()
    assert n_t == n_d
    # decoys share elution group with their targets
    for eg, grp in df.groupby("elution_group_idx"):
        assert set(grp["decoy"].unique()) == {0, 1}
    # mutated sequences differ but keep length
    t = df[df.decoy == 0].sort_values("elution_group_idx")
    d = df[df.decoy == 1].sort_values("elution_group_idx")
    assert (t["sequence"].str.len().values == d["sequence"].str.len().values).all()
    assert (t["sequence"].values != d["sequence"].values).mean() > 0.8
    # second application is a no-op
    n_before = len(df)
    lib = DecoyGenerator("diann")(lib)
    assert len(lib.precursor_df) == n_before


def test_mutation_map():
    assert _mutate_diann("GASP") == "GLSS"[0:4] or len(_mutate_diann("GASP")) == 4


def test_flatten(fasta):
    lib = _full_pipeline_lib(fasta)
    flat = FlattenLibrary(top_k_fragments=6, min_fragment_intensity=0.01)(lib)
    flat = InitFlatColumns()(flat)
    prec, frag = flat.precursor_df, flat.fragment_df
    n_frag = prec["flat_frag_stop_idx"] - prec["flat_frag_start_idx"]
    assert (n_frag <= 6).all()
    assert (n_frag > 0).all()
    assert int(prec["flat_frag_stop_idx"].iloc[-1]) == len(frag)
    # sorted by mz within precursor
    for a, b in zip(prec["flat_frag_start_idx"][:20], prec["flat_frag_stop_idx"][:20]):
        assert (np.diff(frag["mz_library"].values[a:b]) >= 0).all()
    assert "mz_library" in prec.columns and "rt_library" in prec.columns
    assert "mobility_library" in prec.columns
    # b/y codes only
    assert set(frag["type"].unique()) <= {98, 121}


def test_tsv_loader_roundtrip(tmp_path):
    rows = []
    for seq, z, rt in [("PEPTIDEK", 2, 10.0), ("ACDEFGHK", 2, 20.0)]:
        from alphadia_tpu.library import chem

        pmz = chem.precursor_mz(seq, z)
        frags = chem.fragment_mz_arrays(seq, max_charge=1)
        for i in range(3, 6):
            rows.append(
                {
                    "ModifiedPeptide": f"_{seq}_",
                    "StrippedPeptide": seq,
                    "PrecursorCharge": z,
                    "PrecursorMz": pmz,
                    "Tr_recalibrated": rt,
                    "FragmentMz": frags["y_z1"][len(seq) - 1 - i],
                    "RelativeIntensity": 100.0 / i,
                    "FragmentType": "y",
                    "FragmentCharge": 1,
                    "FragmentSeriesNumber": i,
                    "ProteinGroups": "P1",
                    "Genes": "G1",
                }
            )
    p = tmp_path / "lib.tsv"
    pd.DataFrame(rows).to_csv(p, sep="\t", index=False)
    lib = DynamicLoader()(str(p))
    assert isinstance(lib, SpecLibBase)
    assert len(lib.precursor_df) == 2
    # flatten keeps the 3 fragments per precursor with correct mz
    lib = PrecursorInitializer()(lib)
    flat = FlattenLibrary()(lib)
    n = flat.precursor_df["flat_frag_stop_idx"] - flat.precursor_df["flat_frag_start_idx"]
    assert (n == 3).all()


def test_hdf_roundtrip(tmp_path, fasta):
    lib = _full_pipeline_lib(fasta)
    p = tmp_path / "lib.hdf"
    lib.save_hdf(p)
    lib2 = SpecLibBase.load_hdf(p)
    assert len(lib2.precursor_df) == len(lib.precursor_df)
    np.testing.assert_allclose(
        lib2.fragment_mz_df.to_numpy(), lib.fragment_mz_df.to_numpy(), rtol=1e-6
    )


def test_predict_charge_filters_improbable_states(fasta):
    """library_prediction.predict_charge: the packaged charge model drops
    enumerated charge states below min_charge_probability, but every
    peptide keeps at least its most probable charge."""
    lib = digest_fasta([fasta], precursor_charge=(1, 4))
    n_before = len(lib.precursor_df)
    before_keys = set(
        lib.precursor_df["sequence"].astype(str)
        + "|"
        + lib.precursor_df["mods"].astype(str)
    )
    lib = SimplePrediction(predict_charge=True, min_charge_probability=0.3)(lib)
    df = lib.precursor_df
    assert 0 < len(df) < n_before, "charge filter should drop some states"
    after_keys = set(df["sequence"].astype(str) + "|" + df["mods"].astype(str))
    assert after_keys == before_keys, "no peptide may vanish entirely"
    # fragment matrices align with the filtered precursor table
    naa = df["sequence"].str.len().to_numpy()
    assert len(lib.fragment_mz_df) == int((naa - 1).sum())


def test_generate_flat_decoys(fasta):
    """Flat decoy generation: mutated sequences, recomputed fragment m/z
    matching an independently built hierarchical decoy library."""
    from alphadia_tpu.library import chem
    from alphadia_tpu.library.decoy import generate_flat_decoys

    lib = digest_fasta([fasta])
    lib = PrecursorInitializer()(lib)
    lib = SimplePrediction()(lib)
    flat_targets = InitFlatColumns()(FlattenLibrary()(lib.copy()))
    n_t = len(flat_targets.precursor_df)

    out = generate_flat_decoys(flat_targets)
    df = out.precursor_df
    assert len(df) == 2 * n_t
    assert (df["decoy"] == 1).sum() == n_t
    # every decoy shares its target's elution group (FDR competition)
    eg_t = set(df.loc[df["decoy"] == 0, "elution_group_idx"])
    eg_d = set(df.loc[df["decoy"] == 1, "elution_group_idx"])
    assert eg_t == eg_d

    # fragment m/z of each decoy row equals the chem ladder of the mutated
    # sequence at that row's (type, position, charge)
    frag = out.fragment_df
    checked = 0
    for _, r in df[df["decoy"] == 1].head(10).iterrows():
        lad = chem.fragment_mz_arrays(
            r["sequence"], r.get("mods", ""), str(r.get("mod_sites", "")),
            max_charge=2, types=("b", "y"),
        )
        for fi in range(int(r["flat_frag_start_idx"]), int(r["flat_frag_stop_idx"])):
            row = frag.iloc[fi]
            expect = lad[f"{chr(int(row['type']))}_z{int(row['charge'])}"][
                int(row["position"])
            ]
            np.testing.assert_allclose(row["mz_library"], expect, rtol=1e-6)
            checked += 1
    assert checked > 10

    # idempotent: decoys present -> returned unchanged
    again = generate_flat_decoys(out)
    assert len(again.precursor_df) == len(df)


def test_calc_fragment_mz_remaps_intensities_after_reorder():
    """Reordered precursor rows (multiplex channel sort, decoy append)
    must keep each precursor paired with ITS fragment intensities when
    the m/z matrix is re-laid-out."""
    import numpy as np
    import pandas as pd

    from alphadia_tpu.library.speclib import SpecLibBase

    prec = pd.DataFrame(
        {
            "sequence": ["PEPTIDEK", "ACDK"],
            "charge": [2, 2],
            "mods": ["", ""],
            "mod_sites": ["", ""],
        }
    )
    lib = SpecLibBase(prec)
    lib.calc_fragment_mz()
    # distinct per-precursor intensity patterns
    n_rows = len(lib.fragment_mz_df)
    inten = np.zeros((n_rows, len(lib.fragment_mz_df.columns)), np.float32)
    s0 = int(lib.precursor_df["frag_start_idx"].iloc[0])
    e0 = int(lib.precursor_df["frag_stop_idx"].iloc[0])
    s1 = int(lib.precursor_df["frag_start_idx"].iloc[1])
    e1 = int(lib.precursor_df["frag_stop_idx"].iloc[1])
    inten[s0:e0] = 1.0
    inten[s1:e1] = 2.0
    lib.fragment_intensity_df = pd.DataFrame(
        inten, columns=lib.fragment_mz_df.columns
    )

    # reverse the precursor rows and recompute
    lib.precursor_df = lib.precursor_df.iloc[::-1].reset_index(drop=True)
    lib.calc_fragment_mz()
    for i, expect in [(0, 2.0), (1, 1.0)]:  # ACDK first now
        a = int(lib.precursor_df["frag_start_idx"].iloc[i])
        b = int(lib.precursor_df["frag_stop_idx"].iloc[i])
        got = lib.fragment_intensity_df.to_numpy()[a:b]
        assert (got == expect).all(), (i, got)
