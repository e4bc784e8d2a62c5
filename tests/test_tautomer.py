"""Tautomer canonicalization tests (cal_acc.py metric-1 parity)."""

from abcnet_tpu.chem.tautomer import canonicalize_tautomer_smiles as ct
from abcnet_tpu.eval.scoring import score_pairs


def test_keto_enol_converge():
    assert ct("CC(O)=C") == ct("CC(=O)C")


def test_amide_iminol_converge():
    assert ct("CC(O)=N") == ct("CC(=O)N")


def test_imidazole_nh_shift_converges():
    assert ct("c1cnc[nH]1") == ct("c1c[nH]cn1")


def test_stable_molecule_fixed_point():
    once = ct("c1ccccc1O")
    assert once is not None
    assert ct(once) == once


def test_invalid_smiles_returns_none():
    assert ct("not_a_smiles(((") is None


def test_score_pairs_counts_tautomer_matches():
    truths = ["CC(=O)C", "CCO"]
    preds = ["CC(O)=C", "CCN"]     # tautomer match; hard mismatch
    r = score_pairs(truths, preds)
    assert r.exact_match == 0.5
    assert r.exact_match_canonical == 0.0
    assert r.decode_rate == 1.0
    assert 0.0 < r.tanimoto_like < 1.0


def test_score_pairs_none_pred():
    r = score_pairs(["CCO"], [None])
    assert r.decode_rate == 0.0 and r.exact_match == 0.0


# Class-coverage goldens (VERDICT r3 #8): each pair is two tautomeric
# depictions that MUST canonicalize identically, per tautomer family.
import pytest


@pytest.mark.parametrize("a,b", [
    ("CC(=N)N", "CC(N)=N"),                     # amidine
    ("NC(=N)c1ccccc1", "N=C(N)c1ccccc1"),       # aryl amidine
    ("NC(=N)N", "N=C(N)N"),                     # guanidine
    ("CC=NO", "CCN=O"),                         # oxime / nitroso
    ("CC=CN", "CCC=N"),                         # enamine / imine
    ("CC(=O)C", "CC(O)=C"),                     # keto / enol
    ("CC(=O)N", "CC(O)=N"),                     # amide / iminol
    ("CC(=S)N", "CC(S)=N"),                     # thioamide
    ("Oc1ccccn1", "O=c1cccc[nH]1"),             # 2-pyridone (aromatic)
    ("Oc1ncccc1", "O=C1C=CC=CN1"),              # 2-pyridone (kekule)
])
def test_tautomer_class_converges(a, b):
    ca, cb = ct(a), ct(b)
    assert ca is not None and ca == cb, (a, b, ca, cb)


def test_phenol_not_tautomerized_to_dienone():
    # Aromaticity dominates the score: phenol stays phenol even though
    # the cyclohexadienone form is reachable.
    assert ct("Oc1ccccc1") == ct("O=C1C=CC=CC1")
    assert "O" in ct("Oc1ccccc1")


@pytest.mark.parametrize("smi", [
    "CS(C)(=O)=O",                               # dimethyl sulfone
    "c1cc(cc(c1))S(C2CC2)(=O)=O",                # aryl sulfone
    "O=S(=O)(N)c1ccccc1",                        # sulfonamide
    "CC[N+](=O)[O-]",                            # nitro (charged form)
])
def test_hyperoxo_centers_not_tautomerized(smi):
    # The 1,3-shift walker must not move H through sulfonyl/nitro
    # centers: that fabricates hypervalent 'enols' (C=S(O)(O)) RDKit's
    # enumerator never produces, and the scorer would prefer them
    # (chem/tautomer.py:_hyperoxo — the dominant pre-guard divergence
    # class in logs/tautomer_divergence_r4.log).
    c = ct(smi)
    assert c is not None
    assert "=S(" not in c and "S(=C" not in c and not c.startswith("C=S")
