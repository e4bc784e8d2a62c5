"""Pair-independent E/Z assignment guard (crowded-drawing regression).

Distilled from seed 5286 (decode-ceiling residual): stride-4
quantization squeezed BOTH substituents of a trisubstituted alkene's
far end onto the same side of the double-bond axis. Ground truth and
decode index atoms differently, so they evaluated different reference
pairs and wrote CONTRADICTORY isomers. The guard drops the tag when
any same-end substituent pair does not straddle the bond axis — on
both sides symmetrically, so they can never desync.
"""

from abcnet_tpu.chem import from_smiles
from abcnet_tpu.chem.ez import EZ_NONE, assign_ez_from_coords, clear_ez


def _set_coords(mol, coords):
    for i, (x, y) in enumerate(coords):
        mol.atoms[i].x = float(x)
        mol.atoms[i].y = float(y)


def test_same_side_substituents_skip():
    # C0 C1(=C2 (C3)(C4))  — atoms: 0:CH3-a-side, 1:Ca, 2:Cb, 3,4: b-subs
    mol = from_smiles("CC(=C(C)C)C")          # 2-methyl-2-butene-ish
    # coords: bond 1=2 along +x; subs 3 and 4 BOTH above the axis.
    _set_coords(mol, [(-5, 5), (0, 0), (10, 0), (15, 5), (12, 7),
                      (-5, -5)])
    clear_ez(mol)
    assign_ez_from_coords(mol)
    assert all(b.ez == EZ_NONE for b in mol.bonds)


def test_straddling_substituents_assign():
    mol = from_smiles("CC(=C(C)C)C")
    _set_coords(mol, [(-5, 5), (0, 0), (10, 0), (15, 5), (15, -5),
                      (-5, -5)])
    clear_ez(mol)
    assert assign_ez_from_coords(mol) == 1


def test_disubstituted_unaffected():
    mol = from_smiles("C/C=C/C")              # trans-2-butene
    _set_coords(mol, [(-5, 5), (0, 0), (10, 0), (15, -5)])
    clear_ez(mol)
    assert assign_ez_from_coords(mol) == 1
