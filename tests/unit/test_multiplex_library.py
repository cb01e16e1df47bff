import numpy as np
import pytest

from alphadia_tpu.library import chem
from alphadia_tpu.library.digest import digest_fasta
from alphadia_tpu.library.harmonize import PrecursorInitializer
from alphadia_tpu.library.multiplex import MultiplexLibrary
from alphadia_tpu.models.prediction import SimplePrediction


@pytest.fixture()
def lib(tmp_path):
    fasta = tmp_path / "t.fasta"
    fasta.write_text(
        ">sp|P1|A GN=G1\nMKWVTFISKLLFLKFSSAYSRGVFKRRDTHKSEIAHRFKDLGEEHFK\n"
    )
    lib = digest_fasta([str(fasta)], fixed_modifications="")
    lib = PrecursorInitializer()(lib)
    lib = SimplePrediction()(lib)
    return lib


def test_multiplex_library_channels(lib):
    mapping = [
        {"channel_name": 0, "modifications": {}},
        {"channel_name": 4, "modifications": {}},
    ]
    out = MultiplexLibrary(mapping)(lib)
    df = out.precursor_df
    assert set(df["channel"].unique()) == {0, 4}
    # channel copies share elution groups
    for eg, grp in df.groupby("elution_group_idx"):
        assert set(grp["channel"]) == {0, 4}


def test_multiplex_mod_translation(lib):
    chem.register_custom_modification("HeavyK@K", "C(2)H(4)")
    n_with_k = lib.precursor_df["sequence"].str.contains("K").sum()
    assert n_with_k > 0
    # give channel 0 a light label, channel 8 the heavy variant
    src = lib.precursor_df
    # add a variable label on K for the test: mark one K per peptide
    src["mods"] = np.where(
        src["sequence"].str.contains("K"), "Methyl@K", src["mods"]
    )
    src["mod_sites"] = np.where(
        src["sequence"].str.contains("K"),
        (src["sequence"].str.find("K") + 1).astype(str),
        src["mod_sites"],
    )
    lib.calc_precursor_mz()
    mapping = [
        {"channel_name": 0, "modifications": {}},
        {"channel_name": 8, "modifications": {"Methyl@K": "HeavyK@K"}},
    ]
    out = MultiplexLibrary(mapping)(lib)
    df = out.precursor_df
    has_k = df["sequence"].str.contains("K")
    light = df[(df.channel == 0) & has_k].set_index(["sequence", "charge"])
    heavy = df[(df.channel == 8) & has_k].set_index(["sequence", "charge"])
    joined = light.join(heavy, lsuffix="_l", rsuffix="_h")
    charges = joined.index.get_level_values("charge").to_numpy()
    delta = (joined["precursor_mz_h"] - joined["precursor_mz_l"]).to_numpy() * charges
    # HeavyK - Methyl = C2H4 - CH2 = CH2 = 14.0157
    expected = chem.parse_composition("C(2)H(4)") - chem.mod_delta_mass("Methyl")
    ok = np.isfinite(delta)
    assert ok.any()
    assert np.allclose(delta[ok], expected, atol=1e-3)
