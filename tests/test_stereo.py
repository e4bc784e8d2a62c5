"""Tetrahedral stereochemistry tests: parity math, SMILES I/O, wedges."""

import random

from abcnet_tpu.chem import from_smiles, to_smiles
from abcnet_tpu.chem.mol import Atom, Mol, STEREO_HASH, STEREO_WEDGE
from abcnet_tpu.chem.stereo import (VIRTUAL, assign_parities_from_wedges,
                                    map_parity, parity_from_positions,
                                    perm_parity, reference_order)


def test_perm_parity():
    assert perm_parity([0, 1, 2, 3]) == 0
    assert perm_parity([1, 0, 2, 3]) == 1
    assert perm_parity([1, 2, 0]) == 0      # 3-cycle is even
    assert perm_parity([3, 2, 1, 0]) == 0   # two swaps


def test_map_parity_swap_flips():
    assert map_parity(1, [5, 7, 9, VIRTUAL], [7, 5, 9, VIRTUAL]) == 2
    assert map_parity(1, [5, 7, 9, VIRTUAL], [5, 7, 9, VIRTUAL]) == 1
    assert map_parity(0, [1, 2, 3], [3, 2, 1]) == 0


def test_parity_from_positions_known_geometry():
    # n1 on +z; n2,n3,n4 CCW in the plane viewed from +z -> '@' (1).
    center = (0.0, 0.0, 0.0)
    n1 = (0, 0, 1.0)
    n2 = (1.0, 0, -0.3)
    n3 = (-0.5, 0.866, -0.3)
    n4 = (-0.5, -0.866, -0.3)
    assert parity_from_positions(center, [n1, n2, n3, n4]) == 1
    # Swapping two neighbors flips it.
    assert parity_from_positions(center, [n1, n3, n2, n4]) == 2


def test_smiles_roundtrip_stable_and_enantiomers_differ():
    a = to_smiles(from_smiles("N[C@@H](C)C(=O)O"), canonical=True)
    b = to_smiles(from_smiles("N[C@H](C)C(=O)O"), canonical=True)
    assert a != b
    assert to_smiles(from_smiles(a), canonical=True) == a
    assert to_smiles(from_smiles(b), canonical=True) == b


def test_canonical_l_alanine_matches_rdkit_form():
    # RDKit canonical SMILES for L-alanine.
    out = to_smiles(from_smiles("N[C@@H](C)C(=O)O"), canonical=True)
    assert out == "C[C@@H](C(=O)O)N"


def _permuted(mol, perm):
    """Rebuild mol under an atom permutation, remapping parities."""
    out = Mol()
    inv = [0] * len(perm)
    for new, old in enumerate(perm):
        inv[old] = new
    for old in perm:
        a = mol.atoms[old]
        out.add_atom(Atom(a.symbol, a.charge, a.num_explicit_hs,
                          a.aromatic, a.implicit_hs, a.x, a.y,
                          a.isotope, 0))
    for b in mol.bonds:
        out.add_bond(inv[b.a], inv[b.b], b.order, b.aromatic, b.stereo)
    for old in range(mol.num_atoms):
        p = mol.atoms[old].parity
        if not p:
            continue
        ref_old = reference_order(mol, old)
        mapped = [inv[x] if x != VIRTUAL else VIRTUAL for x in ref_old]
        ref_new = reference_order(out, inv[old])
        out.atoms[inv[old]].parity = map_parity(p, mapped, ref_new)
    return out


def test_canonical_invariant_under_relabeling():
    rng = random.Random(0)
    for s in ["N[C@@H](C)C(=O)O", "C[C@H]1CC[C@@H](O)CC1",
              "O[C@@H]1CN[C@H](F)C1"]:
        mol = from_smiles(s)
        want = to_smiles(mol, canonical=True)
        for _ in range(6):
            perm = list(range(mol.num_atoms))
            rng.shuffle(perm)
            assert to_smiles(_permuted(mol, perm), canonical=True) == want


def test_wedge_assignment_roundtrip():
    # A chiral carbon drawn flat: three in-plane neighbors + a wedge.
    # CHFClBr with a wedge to F must give one enantiomer; hash the other.
    for stereo, expect_differs in ((STEREO_WEDGE, None),
                                   (STEREO_HASH, None)):
        mol = Mol()
        c = mol.add_atom(Atom("C", x=0.0, y=0.0))
        f = mol.add_atom(Atom("F", x=0.0, y=1.0))
        cl = mol.add_atom(Atom("Cl", x=0.87, y=-0.5))
        br = mol.add_atom(Atom("Br", x=-0.87, y=-0.5))
        mol.add_bond(c, f, 1, stereo=stereo)
        mol.add_bond(c, cl, 1)
        mol.add_bond(c, br, 1)
        mol.sanitize()
        n = assign_parities_from_wedges(mol)
        assert n == 1
        assert mol.atoms[c].parity in (1, 2)
    # Wedge vs hash must give opposite parities.
    results = []
    for stereo in (STEREO_WEDGE, STEREO_HASH):
        mol = Mol()
        c = mol.add_atom(Atom("C", x=0.0, y=0.0))
        f = mol.add_atom(Atom("F", x=0.0, y=1.0))
        cl = mol.add_atom(Atom("Cl", x=0.87, y=-0.5))
        br = mol.add_atom(Atom("Br", x=-0.87, y=-0.5))
        mol.add_bond(c, f, 1, stereo=stereo)
        mol.add_bond(c, cl, 1)
        mol.add_bond(c, br, 1)
        mol.sanitize()
        assign_parities_from_wedges(mol)
        results.append(to_smiles(mol, canonical=True))
    assert results[0] != results[1]


def test_achiral_emission_unchanged():
    assert to_smiles(from_smiles("CC(N)C(=O)O"), canonical=True).count("@") == 0


# ---------------------------------------------------------------------------
# Cis/trans (E/Z)
# ---------------------------------------------------------------------------

def test_ez_roundtrip_and_difference():
    a = to_smiles(from_smiles("F/C=C/F"), canonical=True)
    b = to_smiles(from_smiles("F/C=C\\F"), canonical=True)
    assert a != b
    assert to_smiles(from_smiles(a), canonical=True) == a
    assert to_smiles(from_smiles(b), canonical=True) == b


def test_ez_conjugated_diene_stable():
    s = to_smiles(from_smiles("C/C=C/C=C/C"), canonical=True)
    assert to_smiles(from_smiles(s), canonical=True) == s
    # the shared middle bond carries one mark for both double bonds
    assert s.count("/") + s.count("\\") >= 3


def test_ez_invariant_under_relabeling():
    from abcnet_tpu.chem.ez import (ez_for_pair, reference_substituents,
                                    set_ez_from_pair)

    def permuted_ez(mol, perm):
        out = Mol()
        inv = [0] * len(perm)
        for new, old in enumerate(perm):
            inv[old] = new
        for old in perm:
            a = mol.atoms[old]
            out.add_atom(Atom(a.symbol, a.charge, a.num_explicit_hs,
                              a.aromatic, a.implicit_hs, a.x, a.y,
                              a.isotope, 0))
        transfers = []
        for bi, b in enumerate(mol.bonds):
            nbi = out.add_bond(inv[b.a], inv[b.b], b.order, b.aromatic,
                               b.stereo)
            if b.ez:
                transfers.append((bi, nbi, b.ez))
        for bi, nbi, ez in transfers:   # after all bonds exist
            ref = reference_substituents(mol, bi)
            set_ez_from_pair(out, nbi, inv[ref[0]], inv[ref[1]], ez)
        return out

    rng = random.Random(1)
    for s in ["F/C=C/F", "C/C=C\\C(Br)Cl", "C/C=C/C=C/C"]:
        mol = from_smiles(s)
        want = to_smiles(mol, canonical=True)
        for _ in range(6):
            perm = list(range(mol.num_atoms))
            rng.shuffle(perm)
            assert to_smiles(permuted_ez(mol, perm),
                             canonical=True) == want


def test_ez_perception_from_coords():
    from abcnet_tpu.chem.ez import EZ_CIS, EZ_TRANS, assign_ez_from_coords
    # trans-2-butene drawn flat: methyls on opposite sides.
    mol = Mol()
    c1 = mol.add_atom(Atom("C", x=0.0, y=1.0))
    c2 = mol.add_atom(Atom("C", x=1.0, y=0.0))
    c3 = mol.add_atom(Atom("C", x=2.0, y=0.0))
    c4 = mol.add_atom(Atom("C", x=3.0, y=-1.0))
    mol.add_bond(c1, c2, 1)
    b = mol.add_bond(c2, c3, 2)
    mol.add_bond(c3, c4, 1)
    mol.sanitize()
    assert assign_ez_from_coords(mol) == 1
    assert mol.bonds[b].ez == EZ_TRANS
    # cis: both methyls same side.
    mol.atoms[c4].x, mol.atoms[c4].y = 3.0, 1.0
    assert assign_ez_from_coords(mol) == 1
    assert mol.bonds[b].ez == EZ_CIS


def test_prune_nonstereogenic():
    from abcnet_tpu.chem.stereo import prune_nonstereogenic
    # C with two methyls is NOT a stereocenter despite the parsed tag.
    mol = from_smiles("C[C@@H](C)O")
    assert mol.atoms[1].parity != 0
    assert prune_nonstereogenic(mol) == 1
    assert mol.atoms[1].parity == 0
    # 1,1-difluoro double bond end: not E/Z stereogenic.
    mol = from_smiles("F/C(F)=C/C")
    assert prune_nonstereogenic(mol) >= (1 if any(b.ez for b in mol.bonds)
                                         else 0)
    assert all(b.ez == 0 for b in mol.bonds)
    # Genuine stereocenter survives.
    mol = from_smiles("N[C@@H](C)C(=O)O")
    assert prune_nonstereogenic(mol) == 0
    assert mol.atoms[1].parity != 0
