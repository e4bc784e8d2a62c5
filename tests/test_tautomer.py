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
