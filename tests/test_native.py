"""Native (C++) assembler parity with the pure-numpy path."""

import random
import subprocess
import sys
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from abcnet_tpu.data.encode import (encode_targets_np, parse_atoms_string,
                                    parse_bonds_string)
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.infer import extract_peaks
from abcnet_tpu.infer.assemble import assemble_smiles, assemble_smiles_native
from abcnet_tpu.infer.native import load_native

sys.path.insert(0, os.path.join(REPO, "tests"))
from test_decode_assemble import fake_logits_from_targets


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True,
                   capture_output=True)
    load_native.cache_clear()
    assert load_native() is not None


def test_native_matches_numpy_path():
    n_match, n_total = 0, 0
    for seed in range(25):
        rng = random.Random(3000 + seed)
        sample = generate_sample(rng, mode="mixed")
        if sample is None:
            continue
        atoms = parse_atoms_string(sample.atoms_string)
        bonds = parse_bonds_string(sample.bonds_string)
        targets = encode_targets_np(atoms, bonds)
        peaks = {k: np.asarray(v) for k, v in
                 extract_peaks(fake_logits_from_targets(targets)).items()}
        py = assemble_smiles(peaks, 0)
        cc = assemble_smiles_native(peaks, 0)
        n_total += 1
        if py == cc:
            n_match += 1
        else:
            print(f"seed {seed}: py={py} cc={cc}")
    assert n_total >= 15
    assert n_match == n_total, f"{n_match}/{n_total} parity"


def test_native_empty_peaks():
    ka, kb = 8, 8
    peaks = {
        "atom_xy": np.zeros((1, ka, 2), np.int32),
        "atom_type": np.zeros((1, ka), np.int32),
        "atom_charge": np.zeros((1, ka), np.int32),
        "atom_hs": np.zeros((1, ka), np.int32),
        "atom_valid": np.zeros((1, ka), bool),
        "bond_xy": np.zeros((1, kb, 2), np.int32),
        "bond_delta": np.zeros((1, kb, 2), np.float32),
        "bond_type": np.zeros((1, kb), np.int32),
        "bond_valid": np.zeros((1, kb), bool),
    }
    assert assemble_smiles_native(peaks, 0) is None
