"""MolBlock round-trip and fingerprint tests.

The decisive consistency property for the whole pipeline: a perfect
detector's output (atom/bond lists -> V2000 MolBlock -> parse ->
canonical SMILES) must reproduce the canonical SMILES of the source
molecule. This mirrors reference decode semantics
(/root/reference/src/img2smiles2.py:299-315, generate_smiles.py:10-119).
"""

import random

import pytest

from abcnet_tpu.chem import canonical_smiles, from_smiles, to_smiles
from abcnet_tpu.chem import perceive_aromaticity
from abcnet_tpu.chem.fingerprint import morgan_dice, morgan_fingerprint
from abcnet_tpu.chem.molblock import (molblock_to_smiles, parse_molblock,
                                      write_molblock)
from abcnet_tpu.chem.random_mol import random_molecule


def mol_to_decoder_lists(mol):
    """Convert a Mol into the lists a perfect decoder would emit."""
    symbols = [a.symbol for a in mol.atoms]
    charges = [a.charge for a in mol.atoms]
    bonds = [[b.a + 1, b.b + 1] for b in mol.bonds]
    bond_types = []
    for b in mol.bonds:
        if b.stereo == 1:
            bond_types.append(5)
        elif b.stereo == 6:
            bond_types.append(6)
        elif b.aromatic:
            bond_types.append(4)
        else:
            bond_types.append(b.order)
    # Aromatic hetero atoms with hydrogens -> MRV_IMPLICIT_H Sgroup,
    # matching the reference's atom_implicit_hs_list (img2smiles2.py:299).
    impl_h = [i + 1 for i, a in enumerate(mol.atoms)
              if a.aromatic and a.symbol != "C" and a.total_hs > 0]
    return symbols, bonds, charges, bond_types, impl_h


SMILES_CASES = [
    "CCO", "c1ccccc1", "Cc1ccccc1", "c1cc[nH]c1", "c1ccncc1",
    "CC(=O)Oc1ccccc1C(=O)O", "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "O=[N+]([O-])c1ccccc1", "CC(=O)[O-]", "C[N+](C)(C)C",
    "c1ccc2[nH]ccc2c1", "c1ccc2ncccc2c1", "OS(=O)(=O)O",
    "FC(F)(F)c1ccc(Cl)cc1", "N#Cc1ccc(Br)cc1",
]


@pytest.mark.parametrize("smi", SMILES_CASES)
def test_molblock_roundtrip(smi):
    mol = from_smiles(smi)
    perceive_aromaticity(mol)
    want = to_smiles(mol, canonical=True)
    symbols, bonds, charges, bond_types, impl_h = mol_to_decoder_lists(mol)
    block = write_molblock(symbols, bonds, charges, bond_types,
                           implicit_h_atoms=impl_h)
    got = molblock_to_smiles(block)
    assert got == want, f"{smi}: {got} != {want}"


def test_molblock_positions_format():
    block = write_molblock(["C", "O"], [[1, 2]], [0, 0], [1],
                           atom_positions=[[30.0, 90.0], [100.0, 10.0]])
    mol = parse_molblock(block)
    assert abs(mol.atoms[0].x - (30.0 / 60 - 1)) < 1e-3
    assert abs(mol.atoms[1].y - (10.0 / 60 - 1)) < 1e-3


def test_molblock_invalid_aromatic_returns_none():
    # A 3-atom aromatic chain cannot kekulize -> None, mirroring RDKit's
    # MolFromMolBlock returning None in the reference.
    block = write_molblock(["C", "C", "C"], [[1, 2], [2, 3]], [0, 0, 0],
                           [4, 4])
    assert molblock_to_smiles(block) is None


def test_random_molecule_roundtrip_bulk():
    """200 random generator molecules survive the full decode round-trip."""
    rng = random.Random(1234)
    failures = []
    for k in range(200):
        mol = random_molecule(rng)
        perceive_aromaticity(mol)
        want = to_smiles(mol, canonical=True)
        symbols, bonds, charges, bond_types, impl_h = mol_to_decoder_lists(mol)
        block = write_molblock(symbols, bonds, charges, bond_types,
                               implicit_h_atoms=impl_h)
        got = molblock_to_smiles(block)
        if got != want:
            failures.append((k, want, got))
    assert not failures, f"{len(failures)}/200 failed; first: {failures[0]}"


def test_fingerprint_identity_and_difference():
    m1 = from_smiles("CC(=O)Oc1ccccc1C(=O)O")
    m2 = from_smiles("CC(=O)Oc1ccccc1C(=O)O")
    m3 = from_smiles("c1ccccc1")
    assert morgan_dice(m1, m2) == 1.0
    d = morgan_dice(m1, m3)
    assert 0.0 < d < 0.7
    fp = morgan_fingerprint(m1)
    assert len(fp) > 10


def test_fingerprint_permutation_invariant():
    from tests.test_chem_smiles import _permute_mol
    rng = random.Random(7)
    mol = from_smiles("Cn1cnc2c1c(=O)n(C)c(=O)n2C")
    base = morgan_fingerprint(mol)
    for _ in range(5):
        perm = list(range(mol.num_atoms))
        rng.shuffle(perm)
        pmol = _permute_mol(mol, perm)
        assert morgan_fingerprint(pmol) == base
