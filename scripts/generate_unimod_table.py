"""Generate constants/unimod_common.tsv — the ~100 most-used UniMod mods.

Fills the modification-coverage role alphabase's bundled UniMod table
plays for the reference (used throughout
/root/reference/alphadia/libtransform/ via alphabase mod names): common
PTMs, isotopic labels, isobaric tags, glycans and artifacts load without
manual registration.

Source of truth: the elemental COMPOSITIONS below, transcribed from the
public UniMod database (unimod.org) / alphabase modification table.
Monoisotopic deltas are COMPUTED from CODATA isotope masses
(library/chem.py `_ELEMENT_MASS`), never hand-copied, so mass and
composition cannot disagree. A spot-check dict of published deltas
guards the transcription.

Run: python scripts/generate_unimod_table.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from alphadia_tpu.library.chem import parse_composition

OUT = Path(__file__).parents[1] / "alphadia_tpu" / "constants" / "unimod_common.tsv"

# name -> alphabase-style composition string (isotopes as 2H/13C/15N/18O)
COMPOSITIONS = {
    # --- core PTMs -------------------------------------------------------
    "Carbamidomethyl": "C(2)H(3)N(1)O(1)",
    "Oxidation": "O(1)",
    "Dioxidation": "O(2)",
    "Trioxidation": "O(3)",
    "Acetyl": "C(2)H(2)O(1)",
    "Phospho": "H(1)O(3)P(1)",
    "Thiophospho": "H(1)O(2)P(1)S(1)",
    "Methyl": "C(1)H(2)",
    "Dimethyl": "C(2)H(4)",
    "Trimethyl": "C(3)H(6)",
    "Ethyl": "C(2)H(4)",
    "Propyl": "C(3)H(6)",
    "GlyGly": "C(4)H(6)N(2)O(2)",
    "LRGG": "C(16)H(29)N(7)O(4)",
    "QQTGG": "C(18)H(29)N(7)O(8)",
    "EQTGG": "C(18)H(28)N(6)O(9)",
    "Deamidated": "H(-1)N(-1)O(1)",
    "Amidated": "H(1)N(1)O(-1)",
    "Gln->pyro-Glu": "H(-3)N(-1)",
    "Glu->pyro-Glu": "H(-2)O(-1)",
    "Ammonia-loss": "H(-3)N(-1)",
    "Dehydrated": "H(-2)O(-1)",
    "Dehydro": "H(-1)",
    "Formyl": "C(1)O(1)",
    "Carbamyl": "C(1)H(1)N(1)O(1)",
    "Carboxy": "C(1)O(2)",
    "Carboxymethyl": "C(2)H(2)O(2)",
    "Carboxyethyl": "C(3)H(4)O(2)",
    "Lactyl": "C(3)H(4)O(2)",
    "Hydroxymethyl": "C(1)H(2)O(1)",
    "Guanidinyl": "C(1)H(2)N(2)",
    "Nitro": "H(-1)N(1)O(2)",
    "Nitrosyl": "H(-1)N(1)O(1)",
    "Cyano": "C(1)H(-1)N(1)",
    "Quinone": "H(-2)O(2)",
    "Sulfo": "O(3)S(1)",
    "Methylthio": "C(1)H(2)S(1)",
    "Delta:H(2)C(2)": "C(2)H(2)",
    "Met-loss": "C(-5)H(-9)N(-1)O(-1)S(-1)",
    "Met-loss+Acetyl": "C(-3)H(-7)N(-1)S(-1)",
    "Pyro-carbamidomethyl": "C(2)O(1)",
    # --- acylations (histone biology) -----------------------------------
    "Propionyl": "C(3)H(4)O(1)",
    "Butyryl": "C(4)H(6)O(1)",
    "Crotonyl": "C(4)H(4)O(1)",
    "Malonyl": "C(3)H(2)O(3)",
    "Succinyl": "C(4)H(4)O(3)",
    "Glutaryl": "C(5)H(6)O(3)",
    "2-Hydroxyisobutyryl": "C(4)H(6)O(2)",
    "Octanoyl": "C(8)H(14)O(1)",
    "Myristoyl": "C(14)H(26)O(1)",
    "Palmitoyl": "C(16)H(30)O(1)",
    "Farnesyl": "C(15)H(24)",
    "GeranylGeranyl": "C(20)H(32)",
    "Lipoyl": "C(8)H(12)O(1)S(2)",
    # --- cysteine chemistry ----------------------------------------------
    "Propionamide": "C(3)H(5)N(1)O(1)",
    "Pyridylethyl": "C(7)H(7)N(1)",
    "Nethylmaleimide": "C(6)H(7)N(1)O(2)",
    "Cysteinyl": "C(3)H(5)N(1)O(2)S(1)",
    "Glutathione": "C(10)H(15)N(3)O(6)S(1)",
    # --- glycans ----------------------------------------------------------
    "Hex": "C(6)H(10)O(5)",
    "Hex(2)": "C(12)H(20)O(10)",
    "Hex(3)": "C(18)H(30)O(15)",
    "HexNAc": "C(8)H(13)N(1)O(5)",
    "HexNAc(2)": "C(16)H(26)N(2)O(10)",
    "Hex(1)HexNAc(1)": "C(14)H(23)N(1)O(10)",
    "Hex(3)HexNAc(2)": "C(34)H(56)N(2)O(25)",
    "dHex": "C(6)H(10)O(4)",
    "NeuAc": "C(11)H(17)N(1)O(8)",
    "NeuGc": "C(11)H(17)N(1)O(9)",
    # --- nucleotide / cofactor adducts ------------------------------------
    "Phosphoadenosine": "C(10)H(12)N(5)O(6)P(1)",
    "ADP-Ribosyl": "C(15)H(21)N(5)O(13)P(2)",
    "Phosphopantetheine": "C(11)H(21)N(2)O(6)P(1)S(1)",
    "PyridoxalPhosphate": "C(8)H(8)N(1)O(5)P(1)",
    "Glycerophospho": "C(3)H(7)O(5)P(1)",
    "Biotin": "C(10)H(14)N(2)O(2)S(1)",
    "HNE": "C(9)H(16)O(2)",
    "Hypusine": "C(4)H(9)N(1)O(1)",
    "Deoxyhypusine": "C(4)H(9)N(1)",
    "Xlink:DSS": "C(8)H(12)O(3)",
    # --- halogenation / metal adducts --------------------------------------
    "Chloro": "H(-1)Cl(1)",
    "Bromo": "H(-1)Br(1)",
    "Iodo": "H(-1)I(1)",
    "Diiodo": "H(-2)I(2)",
    "Cation:Na": "H(-1)Na(1)",
    "Cation:K": "H(-1)K(1)",
    "Cation:Ca[II]": "H(-2)Ca(1)",
    "Cation:Fe[II]": "H(-2)Fe(1)",
    "Cation:Mg[II]": "H(-2)Mg(1)",
    "Cation:Zn[II]": "H(-2)Zn(1)",
    "Cation:Cu[I]": "H(-1)Cu(1)",
    # --- isotopic labels ----------------------------------------------------
    "Label:13C(6)": "C(-6)13C(6)",
    "Label:13C(6)15N(2)": "C(-6)13C(6)N(-2)15N(2)",
    "Label:13C(6)15N(4)": "C(-6)13C(6)N(-4)15N(4)",
    "Label:13C(5)15N(1)": "C(-5)13C(5)N(-1)15N(1)",
    "Label:2H(4)": "H(-4)2H(4)",
    "Label:18O(1)": "O(-1)18O(1)",
    "Label:18O(2)": "O(-2)18O(2)",
    "Methyl:2H(3)": "C(1)H(-1)2H(3)",
    "Acetyl:2H(3)": "C(2)H(-1)2H(3)O(1)",
    "Dimethyl:2H(4)": "C(2)2H(4)",
    "Dimethyl:2H(6)": "C(2)H(-2)2H(6)",
    "Dimethyl:2H(6)13C(2)": "H(-2)2H(6)13C(2)",
    "Propionyl:13C(3)": "H(4)13C(3)O(1)",
    # --- isobaric tags ------------------------------------------------------
    "TMT": "C(12)H(20)N(2)O(2)",
    "TMT2plex": "C(11)13C(1)H(20)N(2)O(2)",
    "TMT6plex": "C(8)13C(4)H(20)N(1)15N(1)O(2)",
    "TMTpro": "C(8)13C(7)H(25)N(1)15N(2)O(3)",
    "TMTpro_zero": "C(15)H(25)N(3)O(3)",
    "iTRAQ4plex": "C(4)13C(3)H(12)N(1)15N(1)O(1)",
    "iTRAQ8plex": "C(7)13C(7)H(24)N(3)15N(1)O(3)",
    "mTRAQ": "C(7)H(12)N(2)O(1)",
    "mTRAQ:13C(3)15N(1)": "C(4)13C(3)H(12)N(1)15N(1)O(1)",
    "mTRAQ:13C(6)15N(2)": "C(1)13C(6)H(12)15N(2)O(1)",
    "SILAC": "",
}

# UniMod accession numbers (only entries transcribed with certainty;
# others stay blank — loaders fall back to name-based parsing)
UNIMOD_IDS = {
    "Acetyl": 1, "Amidated": 2, "Biotin": 3, "Carbamidomethyl": 4,
    "Carbamyl": 5, "Carboxymethyl": 6, "Deamidated": 7, "Phospho": 21,
    "Dehydrated": 23, "Propionamide": 24, "Glu->pyro-Glu": 27,
    "Gln->pyro-Glu": 28, "Cation:Na": 30, "Pyridylethyl": 31,
    "Methyl": 34, "Oxidation": 35, "Dimethyl": 36, "Trimethyl": 37,
    "Methylthio": 39, "Sulfo": 40, "Lipoyl": 42, "HexNAc": 43,
    "Farnesyl": 44, "Myristoyl": 45, "PyridoxalPhosphate": 46,
    "Palmitoyl": 47, "GeranylGeranyl": 48, "Propionyl": 58,
    "Succinyl": 64, "GlyGly": 121, "Formyl": 122, "Label:13C(6)": 188,
    "Label:18O(2)": 193, "ADP-Ribosyl": 213, "iTRAQ4plex": 214,
    "Delta:H(2)C(2)": 254, "Label:18O(1)": 258,
    "Label:13C(6)15N(2)": 259, "Label:13C(6)15N(4)": 267,
    "Nitrosyl": 275, "Ethyl": 280, "Methyl:2H(3)": 298, "Carboxy": 299,
    "Cysteinyl": 312, "Bromo": 340, "Trioxidation": 345, "Nitro": 354,
    "Dioxidation": 425, "Label:2H(4)": 481, "iTRAQ8plex": 730,
    "TMT6plex": 737, "TMT": 739, "Met-loss": 765, "Met-loss+Acetyl": 766,
    "TMTpro": 2016,
}

# published UniMod monoisotopic deltas guarding the transcription
PUBLISHED_SPOT_CHECKS = {
    "Carbamidomethyl": 57.021464,
    "Phospho": 79.966331,
    "Acetyl": 42.010565,
    "GlyGly": 114.042927,
    "TMT6plex": 229.162932,
    "TMTpro": 304.207146,
    "iTRAQ8plex": 304.205360,
    "Hex(3)HexNAc(2)": 892.317215,
    "NeuAc": 291.095417,
    "Met-loss": -131.040485,
    "Label:13C(6)15N(2)": 8.014199,
    "Dimethyl:2H(6)": 34.068961,
    "ADP-Ribosyl": 541.061110,
    "Iodo": 125.896648,
    "Succinyl": 100.016044,
}

_CHNOS = ("C", "H", "N", "O", "S")


def _chnos(formula: str) -> tuple[int, ...]:
    """(C,H,N,O,S) envelope deltas; isotope-labeled atoms excluded (their
    envelope is fixed, matching the existing MOD_TABLE label convention)."""
    import re

    counts = dict.fromkeys(_CHNOS, 0)
    for elem, count in re.findall(r"(\d*[A-Z][a-z]?)\((-?\d+)\)", formula):
        if elem in counts:
            counts[elem] += int(count)
    return tuple(counts[e] for e in _CHNOS)


def main() -> None:
    rows = []
    for name, formula in COMPOSITIONS.items():
        mass = parse_composition(formula) if formula else 0.0
        if name in PUBLISHED_SPOT_CHECKS:
            ref = PUBLISHED_SPOT_CHECKS[name]
            assert abs(mass - ref) < 5e-4, (
                f"{name}: computed {mass:.6f} vs published {ref:.6f}"
            )
        c, h, n, o, s = _chnos(formula)
        uid = UNIMOD_IDS.get(name, "")
        rows.append(f"{name}\t{formula}\t{mass:.6f}\t{c}\t{h}\t{n}\t{o}\t{s}\t{uid}")
    OUT.write_text(
        "# generated by scripts/generate_unimod_table.py — do not edit\n"
        "# name\tcomposition\tmono_delta\tdC\tdH\tdN\tdO\tdS\tunimod_id\n"
        + "\n".join(rows)
        + "\n"
    )
    print(f"wrote {len(rows)} modifications to {OUT}")


if __name__ == "__main__":
    main()
