"""Generated UniMod common-mods table: coverage + published-value checks.

(reference analog: alphabase's bundled UniMod table used by
alphadia/libtransform/ — mod-heavy libraries must load without manual
registration.)
"""

import numpy as np
import pytest

from alphadia_tpu.library.chem import (
    MOD_TABLE,
    UNIMOD_ID_TO_NAME,
    mod_delta_mass,
    parse_mod_spec,
    residue_masses,
)

# published UniMod monoisotopic deltas (unimod.org), transcribed
# independently of scripts/generate_unimod_table.py's spot-check dict
PUBLISHED = {
    "Oxidation": 15.994915,
    "Phospho": 79.966331,
    "TMT": 224.152478,
    "TMTpro": 304.207146,
    "iTRAQ4plex": 144.102063,
    "Succinyl": 100.016044,
    "Crotonyl": 68.026215,
    "Malonyl": 86.000394,
    "Biotin": 226.077598,
    "Hex": 162.052824,
    "HexNAc": 203.079373,
    "dHex": 146.057909,
    "NeuGc": 307.090331,
    "Myristoyl": 210.198366,
    "Palmitoyl": 238.229666,
    "Farnesyl": 204.187801,
    "Nitro": 44.985078,
    "Cation:Na": 21.981943,
    "Cation:K": 37.955882,
    "Label:13C(6)": 6.020129,
    "Label:2H(4)": 4.025107,
    "Methyl:2H(3)": 17.034480,
    "Glu->pyro-Glu": -18.010565,
    "Met-loss+Acetyl": -89.029920,
    "Glutathione": 305.068156,
    "Pyridylethyl": 105.057849,
    "Nethylmaleimide": 125.047679,
    "QQTGG": 471.207783,
}


def test_table_size_and_ids():
    assert len(MOD_TABLE) >= 100, f"only {len(MOD_TABLE)} mods shipped"
    assert len(UNIMOD_ID_TO_NAME) >= 50
    assert UNIMOD_ID_TO_NAME[21] == "Phospho"
    assert UNIMOD_ID_TO_NAME[737] == "TMT6plex"
    assert UNIMOD_ID_TO_NAME[2016] == "TMTpro"


@pytest.mark.parametrize("name,delta", sorted(PUBLISHED.items()))
def test_published_monoisotopic_deltas(name, delta):
    assert abs(mod_delta_mass(name) - delta) < 5e-4, (
        f"{name}: {mod_delta_mass(name):.6f} vs published {delta:.6f}"
    )


def test_phospho_tmt_peptide_mass():
    """A TMTpro-labelled phosphopeptide's residue masses assemble from
    the table alone (no manual registration)."""
    seq = "SAMPLEK"
    mods = "TMTpro@Any_N-term;Phospho@S;TMTpro@K"
    sites = "0;1;7"
    masses = residue_masses(seq, mods, sites)
    plain = residue_masses(seq)
    np.testing.assert_allclose(
        masses.sum() - plain.sum(),
        2 * 304.207146 + 79.966331,
        atol=1e-3,
    )
    assert parse_mod_spec(mods) == [
        ("TMTpro", "Any_N-term"), ("Phospho", "S"), ("TMTpro", "K")
    ]
