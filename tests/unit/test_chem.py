import numpy as np
import pytest

from alphadia_tpu.library import chem


def test_precursor_mz_known_values():
    # PEPTIDE 2+: well-known monoisotopic M = 799.35996, mz2+ = 400.68726
    assert chem.precursor_mz("PEPTIDE", 2) == pytest.approx(400.68726, abs=1e-3)
    # Angiotensin II DRVYIHPF 2+ = 523.7750
    assert chem.precursor_mz("DRVYIHPF", 2) == pytest.approx(523.7751, abs=1e-3)


def test_fragment_ladders():
    frags = chem.fragment_mz_arrays("PEPTIDE", max_charge=1)
    # b2 of PEPTIDE = 227.1026, y1 = 148.0604, y6 = 703.3141
    assert frags["b_z1"][1] == pytest.approx(227.1026, abs=1e-3)
    assert frags["y_z1"][-1] == pytest.approx(148.0604, abs=1e-3)
    assert frags["y_z1"][0] == pytest.approx(703.3144, abs=1e-3)
    # b + y neutral sums = M + H2O at every site (as singly protonated: +2 protons)
    M = chem.residue_masses("PEPTIDE").sum() + chem.MASS_H2O
    np.testing.assert_allclose(
        frags["b_z1"] + frags["y_z1"][::-1][::-1],
        frags["b_z1"] + frags["y_z1"],
    )
    total = frags["b_z1"] + frags["y_z1"] - 2 * chem.MASS_PROTON
    np.testing.assert_allclose(total, M, atol=1e-6)


def test_modified_masses():
    base = chem.precursor_mz("ACDEK", 2)
    cam = chem.precursor_mz("ACDEK", 2, "Carbamidomethyl@C", "2")
    assert cam - base == pytest.approx(57.02146 / 2, abs=1e-4)


def test_isotope_envelope_sane():
    comp = chem.peptide_compositions(["PEPTIDE", "WWWWWWWWWW"])
    env = chem.isotope_envelopes(comp, k_max=4)
    assert env.shape == (2, 4)
    np.testing.assert_allclose(env.sum(axis=1), 1.0, atol=1e-3)
    # monoisotopic dominates for small peptide
    assert env[0, 0] > env[0, 1] > env[0, 2]
    # larger peptide has relatively larger +1 peak
    assert env[1, 1] / env[1, 0] > env[0, 1] / env[0, 0]
    # rough check vs known: peptide with ~36 C atoms has M+1/M ~ 0.40
    ratio = env[0, 1] / env[0, 0]
    assert 0.3 < ratio < 0.5
