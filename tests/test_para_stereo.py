"""Stereo-dependent (para / pseudoasymmetric) stereocenters.

Round-1 PARITY.md known gap, VERDICT r1 next-round #8: the old prune
used stereo-blind canonical ranks, so a center whose two branches are
constitutionally identical but R vs S (CIP pseudoasymmetric, lowercase
r/s) was wrongly cleared. The published facts these tests pin:

* 2,3,4-trihydroxyglutaric acid has exactly FOUR stereoisomers: two
  meso forms (ribaric, xylaric — differing only in the r/s of C3,
  which is a pseudoasymmetric center) and the (2R,4R)/(2S,4S)
  enantiomer pair, whose C3 is NOT a stereocenter.
* tartaric acid has exactly THREE stereoisomers: meso + the d/l pair
  (both centers are ordinary stereocenters; nothing is pruned).
"""

from abcnet_tpu.chem import canonical_smiles, from_smiles, to_smiles
from abcnet_tpu.chem.smiles import perceive_aromaticity
from abcnet_tpu.chem.stereo import prune_nonstereogenic


def _canon_after_prune(smi: str) -> str:
    mol = from_smiles(smi)
    perceive_aromaticity(mol)
    prune_nonstereogenic(mol)
    return to_smiles(mol, canonical=True)


def _tag_count(s: str) -> int:
    return s.count("@@") + (s.count("@") - 2 * s.count("@@"))


THG = "OC(=O)[C{a}H](O)[C{c}H](O)[C{b}H](O)C(=O)O"


def _thg(a, b, c):
    return THG.format(a=a, b=b, c=c)


def test_trihydroxyglutaric_acid_has_four_stereoisomers():
    forms = set()
    for a in ("@", "@@"):
        for b in ("@", "@@"):
            for c in ("@", "@@"):
                forms.add(_canon_after_prune(_thg(a, b, c)))
    assert len(forms) == 4, forms


def test_pseudoasymmetric_center_kept_and_distinguishes_mesos():
    # For each (C2, C4) combo, flipping the C3 tag either changes the
    # molecule (para center KEPT -> two meso diastereomers) or not
    # (C3 pruned -> the C2=C4 enantiomer case). Exactly two combos
    # behave each way, and the kept case yields tagged C3.
    kept, pruned = [], []
    for a in ("@", "@@"):
        for b in ("@", "@@"):
            s1 = _canon_after_prune(_thg(a, b, "@"))
            s2 = _canon_after_prune(_thg(a, b, "@@"))
            if s1 != s2:
                kept.append((a, b))
                assert _tag_count(s1) == 3     # all three tags survive
            else:
                pruned.append((a, b))
                assert _tag_count(s1) == 2     # C3's tag was cleared
    assert len(kept) == 2 and len(pruned) == 2
    # the kept combos are the mixed-configuration (R,S-type) ones:
    # they are each other's (a,b) swap, as are the pruned ones
    assert kept[0] != kept[1] and pruned[0] != pruned[1]


def test_pruned_pair_is_enantiomeric_not_identical():
    (a1, b1), (a2, b2) = [(x, y) for x in ("@", "@@")
                          for y in ("@", "@@")
                          if _canon_after_prune(_thg(x, y, "@"))
                          == _canon_after_prune(_thg(x, y, "@@"))]
    s1 = _canon_after_prune(_thg(a1, b1, "@"))
    s2 = _canon_after_prune(_thg(a2, b2, "@"))
    assert s1 != s2                                  # enantiomers differ
    assert canonical_smiles(s1, isomeric=False) == \
        canonical_smiles(s2, isomeric=False)


def test_tartaric_acid_has_three_stereoisomers():
    forms = set()
    for a in ("@", "@@"):
        for b in ("@", "@@"):
            forms.add(_canon_after_prune(
                f"OC(=O)[C{a}H](O)[C{b}H](O)C(=O)O"))
    assert len(forms) == 3, forms
    # nothing pruned: every form keeps both tags
    for f in forms:
        assert _tag_count(f) == 2


def test_ordinary_centers_untouched():
    s = "C[C@H](N)C(=O)O"
    assert _canon_after_prune(s) == canonical_smiles(s)
