"""Tests for the standalone SMILES parser/canonicalizer.

Mirrors what the reference gets from RDKit round-trips
(MolFromSmiles → MolToSmiles(canonical=True)).
"""

import itertools
import random

import pytest

from abcnet_tpu.chem import canonical_smiles, from_smiles, to_smiles
from abcnet_tpu.chem.smiles import canonical_ranks


MOLECULES = [
    # (name, smiles)
    ("methane", "C"),
    ("ethanol", "CCO"),
    ("acetic acid", "CC(=O)O"),
    ("benzene", "c1ccccc1"),
    ("benzene kekulized", "C1=CC=CC=C1"),
    ("toluene", "Cc1ccccc1"),
    ("pyridine", "c1ccncc1"),
    ("pyrrole", "c1cc[nH]c1"),
    ("furan", "c1ccoc1"),
    ("thiophene", "c1ccsc1"),
    ("imidazole", "c1c[nH]cn1"),
    ("naphthalene", "c1ccc2ccccc2c1"),
    ("indole", "c1ccc2[nH]ccc2c1"),
    ("aspirin", "CC(=O)Oc1ccccc1C(=O)O"),
    ("caffeine", "Cn1cnc2c1c(=O)n(C)c(=O)n2C"),
    ("nitrobenzene", "O=[N+]([O-])c1ccccc1"),
    ("tma", "C[N+](C)(C)C"),
    ("acetate anion", "CC(=O)[O-]"),
    ("acetonitrile", "CC#N"),
    ("cyclohexane", "C1CCCCC1"),
    ("isobutane", "CC(C)C"),
    ("neopentane", "CC(C)(C)C"),
    ("biphenyl", "c1ccc(-c2ccccc2)cc1"),
    ("styrene", "C=Cc1ccccc1"),
    ("phenol", "Oc1ccccc1"),
    ("aniline", "Nc1ccccc1"),
    ("chlorobenzene", "Clc1ccccc1"),
    ("bromoform", "BrC(Br)Br"),
    ("DMSO", "CS(=O)C"),
    ("sulfuric acid", "OS(=O)(=O)O"),
    ("triphenylphosphine-ish", "c1ccc(P(c2ccccc2)c2ccccc2)cc1"),
    ("morpholine", "C1COCCN1"),
    ("piperazine", "C1CNCCN1"),
    ("quinoline", "c1ccc2ncccc2c1"),
    ("spiro", "C1CCC2(CC1)CCCC2"),
    ("adamantane-ish cage", "C1C2CC3CC1CC(C2)C3"),
    ("selenophene", "c1cc[se]c1"),
    ("silane chain", "C[Si](C)(C)C"),
    ("boronic acid", "OB(O)c1ccccc1"),
    ("iodobenzene", "Ic1ccccc1"),
    ("pyrimidine", "c1cncnc1"),
    ("benzoquinone", "O=C1C=CC(=O)C=C1"),
    ("pyridone", "O=c1cccc[nH]1"),
    ("disconnected", "CC(=O)[O-].C[N+](C)(C)C"),
]


@pytest.mark.parametrize("name,smi", MOLECULES, ids=[m[0] for m in MOLECULES])
def test_roundtrip_stable(name, smi):
    """canonical(canonical(s)) == canonical(s)."""
    c1 = canonical_smiles(smi)
    c2 = canonical_smiles(c1)
    assert c1 == c2, f"{name}: {c1} != {c2}"


@pytest.mark.parametrize("name,smi", MOLECULES, ids=[m[0] for m in MOLECULES])
def test_atom_bond_counts_preserved(name, smi):
    mol = from_smiles(smi)
    mol2 = from_smiles(canonical_smiles(smi))
    assert mol.num_atoms == mol2.num_atoms
    assert mol.num_bonds == mol2.num_bonds
    # Molecular formula must match exactly (incl. implicit Hs).
    def formula(m):
        counts = {}
        for i, a in enumerate(m.atoms):
            counts[a.symbol] = counts.get(a.symbol, 0) + 1
            counts["H"] = counts.get("H", 0) + a.total_hs
        return counts
    assert formula(mol) == formula(mol2), name


def test_kekule_equals_aromatic_input():
    assert canonical_smiles("c1ccccc1") == canonical_smiles("C1=CC=CC=C1")
    assert canonical_smiles("c1ccncc1") == canonical_smiles("C1=CC=NC=C1")
    assert canonical_smiles("c1cc[nH]c1") == canonical_smiles("C1=CC=CN1")
    # Both kekulizations of toluene's ring converge.
    assert canonical_smiles("Cc1ccccc1") == canonical_smiles("CC1=CC=CC=C1")


def test_canonical_invariant_under_atom_renumbering():
    """Isomorphic inputs written differently must canonicalize equally."""
    variants = {
        "aspirin": ["CC(=O)Oc1ccccc1C(=O)O",
                    "O=C(O)c1ccccc1OC(C)=O",
                    "c1ccc(C(=O)O)c(OC(C)=O)c1"],
        "isopentane": ["CCC(C)C", "C(C)(C)CC", "CC(CC)C"],
        "imidazole": ["c1c[nH]cn1", "c1cnc[nH]1"],
        "naphthalene": ["c1ccc2ccccc2c1", "c1cc2ccccc2cc1",
                        "C1=CC2=CC=CC=C2C=C1"],
    }
    for name, forms in variants.items():
        canons = {canonical_smiles(s) for s in forms}
        assert len(canons) == 1, f"{name}: {canons}"


def test_implicit_hydrogens():
    mol = from_smiles("CCO")
    assert [a.total_hs for a in mol.atoms] == [3, 2, 1]
    mol = from_smiles("c1ccccc1")
    assert all(a.total_hs == 1 for a in mol.atoms)
    mol = from_smiles("c1cc[nH]c1")
    ns = [a for a in mol.atoms if a.symbol == "N"]
    assert ns[0].total_hs == 1
    mol = from_smiles("c1ccncc1")
    ns = [a for a in mol.atoms if a.symbol == "N"]
    assert ns[0].total_hs == 0
    mol = from_smiles("[NH4+]")
    assert mol.atoms[0].total_hs == 4
    mol = from_smiles("CC(=O)[O-]")
    charged = [a for a in mol.atoms if a.charge == -1]
    assert charged[0].total_hs == 0


def test_charges_roundtrip():
    c = canonical_smiles("O=[N+]([O-])c1ccccc1")
    mol = from_smiles(c)
    charges = sorted(a.charge for a in mol.atoms)
    assert charges[0] == -1 and charges[-1] == 1


def _permute_mol(mol, perm):
    """Rebuild a Mol with atoms relabeled by ``perm`` (old idx -> new idx)."""
    from abcnet_tpu.chem import Atom, Mol
    out = Mol()
    order = sorted(range(mol.num_atoms), key=lambda i: perm[i])
    for old in order:
        a = mol.atoms[old]
        out.add_atom(Atom(a.symbol, a.charge, a.num_explicit_hs, a.aromatic,
                          a.implicit_hs, a.x, a.y, a.isotope))
    bond_order = sorted(range(mol.num_bonds),
                        key=lambda i: (perm[mol.bonds[i].a],
                                       perm[mol.bonds[i].b]))
    for bi in bond_order:
        b = mol.bonds[bi]
        out.add_bond(perm[b.a], perm[b.b], b.order, b.aromatic, b.stereo)
    return out


def test_random_renumbering_fuzz():
    """Random atom permutations must not change the canonical SMILES."""
    from abcnet_tpu.chem import to_smiles as ts
    from abcnet_tpu.chem import perceive_aromaticity
    rng = random.Random(0)
    for name, smi in MOLECULES:
        mol = from_smiles(smi)
        perceive_aromaticity(mol)
        base = canonical_smiles(smi)
        for _ in range(5):
            perm = list(range(mol.num_atoms))
            rng.shuffle(perm)
            pmol = _permute_mol(mol, perm)
            assert to_smiles(pmol, canonical=True) == base, (
                f"{name}: permuted form diverged")


def test_orbit_pruning_symmetric_molecules():
    """The canonical search prunes root tie-break branches via
    automorphism orbits discovered from byte-equal candidate strings
    (smiles.py _canon_search). High-symmetry molecules are where the
    pruning fires hardest — the canonical form must stay invariant
    under renumbering there, and the search must stay within budget."""
    from abcnet_tpu.chem import perceive_aromaticity
    symmetric = [
        ("benzene", "c1ccccc1"),
        ("cubane-like cyclooctane", "C1CCCCCCC1"),
        ("hexamethylbenzene", "Cc1c(C)c(C)c(C)c(C)c1C"),
        ("biphenyl", "c1ccc(-c2ccccc2)cc1"),
        ("tetramethylmethane", "CC(C)(C)C"),
        ("triphenylmethane", "C(c1ccccc1)(c1ccccc1)c1ccccc1"),
        ("porphyrin-ish macrocycle", "C1CC2CCC1CC2"),
        ("18-crown-6", "C1COCCOCCOCCOCCOCCO1"),
    ]
    rng = random.Random(3)
    for name, smi in symmetric:
        mol = from_smiles(smi)
        perceive_aromaticity(mol)
        base = to_smiles(mol, canonical=True)
        for _ in range(6):
            perm = list(range(mol.num_atoms))
            rng.shuffle(perm)
            pmol = _permute_mol(mol, perm)
            perceive_aromaticity(pmol)
            assert to_smiles(pmol, canonical=True) == base, name


def test_canonical_fuzz_random_molecules():
    """Canonical stability: parse(write(mol)) is a fixed point over a
    population of random drug-like molecules."""
    import random as _random

    from abcnet_tpu.chem import perceive_aromaticity
    from abcnet_tpu.chem.random_mol import random_molecule

    rng = _random.Random(7)
    for _ in range(60):
        mol = random_molecule(rng)
        perceive_aromaticity(mol)
        s1 = to_smiles(mol, canonical=True)
        s2 = to_smiles(from_smiles(s1), canonical=True)
        assert s1 == s2, s1


def test_non_isomeric_output():
    """isomeric=False strips stereo — MolToSmiles(isomericSmiles=False)
    parity, the reference's second accuracy metric (cal_acc.py:35-36)."""
    from abcnet_tpu.chem import canonical_smiles

    # E and Z isomers collapse to one non-isomeric form.
    e = canonical_smiles(r"C/C=C/C", isomeric=False)
    z = canonical_smiles(r"C/C=C\C", isomeric=False)
    assert e == z
    assert "/" not in e and "\\" not in e
    # Enantiomers collapse; tags are gone from the output.
    a = canonical_smiles("C[C@H](N)C(=O)O", isomeric=False)
    b = canonical_smiles("C[C@@H](N)C(=O)O", isomeric=False)
    assert a == b
    assert "@" not in a
    # Constitutionally different molecules stay different.
    assert (canonical_smiles("CCO", isomeric=False)
            != canonical_smiles("CCN", isomeric=False))
    # Isomeric output unchanged by the new flag's default.
    assert "@" in canonical_smiles("C[C@H](N)C(=O)O")
