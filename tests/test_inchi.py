"""InChI reader goldens (VERDICT r3 missing #4).

Each case pairs a standard InChI with the molecule's SMILES; the test
asserts inchi_to_smiles(inchi) equals the chem stack's non-isomeric
canonical form of that SMILES — i.e. the reader reconstructs the same
graph (connectivity, H counts, charges, bond orders) that the SMILES
describes. Parity surface: inchi2smiles =
MolFromInchi + MolToSmiles(isomericSmiles=False)
(/root/reference/src/multi_proc_img2smiles2.py:329-346).
"""

import pytest

from abcnet_tpu.chem.inchi import inchi_to_smiles, parse_inchi
from abcnet_tpu.chem.smiles import canonical_smiles

# (name, standard InChI, reference SMILES)
GOLDENS = [
    ("methane", "InChI=1S/CH4/h1H4", "C"),
    ("water", "InChI=1S/H2O/h1H2", "O"),
    ("ethanol", "InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3", "CCO"),
    ("benzene", "InChI=1S/C6H6/c1-2-4-6-5-3-1/h1-6H", "c1ccccc1"),
    ("toluene", "InChI=1S/C7H8/c1-7-5-3-2-4-6-7/h2-6H,1H3",
     "Cc1ccccc1"),
    ("pyridine", "InChI=1S/C5H5N/c1-2-4-6-5-3-1/h1-5H", "c1ccncc1"),
    ("phenol", "InChI=1S/C6H6O/c7-6-4-2-1-3-5-6/h1-5,7H", "Oc1ccccc1"),
    ("naphthalene",
     "InChI=1S/C10H8/c1-2-6-10-8-4-3-7-9(10)5-1/h1-8H",
     "c1ccc2ccccc2c1"),
    ("isobutane", "InChI=1S/C4H10/c1-4(2)3/h4H,1-3H3", "CC(C)C"),
    ("acetic-acid", "InChI=1S/C2H4O2/c1-2(3)4/h1H3,(H,3,4)",
     "CC(=O)O"),
    ("acetonitrile", "InChI=1S/C2H3N/c1-2-3/h1H3", "CC#N"),
    ("acetylene", "InChI=1S/C2H2/c1-2/h1-2H", "C#C"),
    ("dmso", "InChI=1S/C2H6OS/c1-4(2)3/h1-2H3", "CS(C)=O"),
    ("glycine", "InChI=1S/C2H5NO2/c3-1-2(4)5/h1,3H2,(H,4,5)",
     "NCC(=O)O"),
    ("urea", "InChI=1S/CH4N2O/c2-1(3)4/h(H4,2,3,4)", "NC(N)=O"),
    ("nitrobenzene",
     "InChI=1S/C6H5NO2/c8-7(9)6-4-2-1-3-5-6/h1-5H",
     "O=[N+]([O-])c1ccccc1"),
    ("aspirin",
     "InChI=1S/C9H8O4/c1-6(10)13-8-5-3-2-4-7(8)9(11)12/h2-5H,1H3,(H,11,12)",
     "CC(=O)Oc1ccccc1C(=O)O"),
    ("caffeine",
     "InChI=1S/C8H10N4O2/c1-10-4-9-6-5(10)7(13)12(3)8(14)11(2)6/"
     "h4H,1-3H3",
     "Cn1cnc2c1c(=O)n(C)c(=O)n2C"),
    ("imidazole", "InChI=1S/C3H4N2/c1-2-5-3-4-1/h1-3H,(H,4,5)",
     "c1c[nH]cn1"),
    ("thiophene", "InChI=1S/C4H4S/c1-2-4-5-3-1/h1-4H", "c1ccsc1"),
    ("furan", "InChI=1S/C4H4O/c1-2-4-5-3-1/h1-4H", "c1ccoc1"),
    ("trifluoromethane", "InChI=1S/CHF3/c2-1(3)4/h1H", "FC(F)F"),
    ("dimethyl-sulfate? no - dms", "InChI=1S/C2H6S/c1-3-2/h1-2H3",
     "CSC"),
]

CHARGED = [
    ("acetate", "InChI=1S/C2H4O2/c1-2(3)4/h1H3,(H,3,4)/p-1",
     "CC(=O)[O-]"),
    ("ammonium", "InChI=1S/H3N/h1H3/p+1", "[NH4+]"),
    ("tetramethylammonium",
     "InChI=1S/C4H12N/c1-5(2,3)4/h1-4H3/q+1", "C[N+](C)(C)C"),
    ("phenolate", "InChI=1S/C6H6O/c7-6-4-2-1-3-5-6/h1-5,7H/p-1",
     "[O-]c1ccccc1"),
]

MULTI = [
    ("sodium-chloride", "InChI=1S/ClH.Na/h1H;/q;+1/p-1",
     "[Cl-].[Na+]"),
    ("ethanol-hydrate", "InChI=1S/C2H6O.H2O/c1-2-3;/h3H,2H2,1H3;1H2",
     "CCO.O"),
]


def _expected(smiles: str) -> str:
    return canonical_smiles(smiles, isomeric=False)


@pytest.mark.parametrize("name,inchi,smiles", GOLDENS,
                         ids=[g[0] for g in GOLDENS])
def test_inchi_goldens(name, inchi, smiles):
    assert inchi_to_smiles(inchi) == _expected(smiles)


@pytest.mark.parametrize("name,inchi,smiles", CHARGED,
                         ids=[g[0] for g in CHARGED])
def test_inchi_charged(name, inchi, smiles):
    assert inchi_to_smiles(inchi) == _expected(smiles)


@pytest.mark.parametrize("name,inchi,smiles", MULTI,
                         ids=[g[0] for g in MULTI])
def test_inchi_multicomponent(name, inchi, smiles):
    got = inchi_to_smiles(inchi)
    assert got is not None
    # Fragment order is writer-dependent; compare as fragment multisets
    # of canonical forms.
    assert sorted(got.split(".")) == sorted(_expected(smiles).split("."))


def test_inchi_rejects_garbage():
    assert inchi_to_smiles(None) is None
    assert inchi_to_smiles("not an inchi") is None
    assert inchi_to_smiles("InChI=1S/") is None
    # Formula/connection mismatch.
    assert inchi_to_smiles("InChI=1S/CH4/c1-2/h1H4") is None


def test_inchi_mol_details():
    m = parse_inchi("InChI=1S/C6H5NO2/c8-7(9)6-4-2-1-3-5-6/h1-5H")
    charges = sorted(a.charge for a in m.atoms)
    assert charges.count(1) == 1 and charges.count(-1) == 1
    assert sum(a.charge for a in m.atoms) == 0


def test_cal_acc_inchi_column(tmp_path, capsys):
    # cal-acc accepts InChI ground truth (reference flow:
    # multi_proc_img2smiles2.py:350 maps the InChI column through
    # inchi2smiles before scoring).
    import pandas as pd

    from abcnet_tpu.__main__ import _cmd_cal_acc

    csv = tmp_path / "r.csv"
    pd.DataFrame({
        "InChI": ["InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3",
                  "InChI=1S/C6H6/c1-2-4-6-5-3-1/h1-6H"],
        "smiles_pred": ["CCO", "c1ccccc1"],
    }).to_csv(csv, index=False)

    class A:
        results = str(csv)

    _cmd_cal_acc(A())
    out = capsys.readouterr().out
    assert "exact" in out and "1.0000" in out


def test_inchi_writer_goldens():
    from abcnet_tpu.chem.inchi import smiles_to_inchi

    # Reader-compatible strings (non-official numbering — see
    # write_inchi docstring); formula and layer structure must hold.
    s = smiles_to_inchi("CCO")
    assert s.startswith("InChI=1S/C2H6O/c") and "/h" in s
    assert smiles_to_inchi(None) is None
    assert smiles_to_inchi("not smiles") is None
    assert smiles_to_inchi("C[N+](C)(C)C").endswith("/q+1")


def test_inchi_roundtrip_fuzz():
    """write_inchi -> parse_inchi must reproduce the molecule exactly
    (canonical non-isomeric SMILES) on random drug-like molecules —
    connectivity, H placement, charges and reconstructed bond orders
    all survive the trip."""
    import random

    from abcnet_tpu.chem.inchi import write_inchi
    from abcnet_tpu.chem.random_mol import random_molecule
    from abcnet_tpu.chem.smiles import to_smiles

    rng = random.Random(20260818)
    mismatches = []
    n = 200
    for i in range(n):
        mol = random_molecule(rng)
        want = to_smiles(mol, canonical=True, isomeric=False)
        inchi = write_inchi(mol)
        got = inchi_to_smiles(inchi)
        if got != want:
            mismatches.append((want, got, inchi))
    # Charge-placement reconstruction can legitimately differ on exotic
    # zwitterions; anything beyond a stray case is a reader/writer bug.
    assert len(mismatches) <= 2, mismatches[:5]


def test_inchi_stereo_layers_ignored():
    # L-alanine: /t and /m layers present; non-isomeric output equals
    # the flat-SMILES canonical form.
    inchi = "InChI=1S/C3H7NO2/c1-2(4)3(5)6/h2H,4H2,1H3,(H,5,6)/t2-/m0/s1"
    assert inchi_to_smiles(inchi) == _expected("CC(N)C(=O)O")
