"""Exact-agreement validation of the native canonical-SMILES engine
(native/smiles.cpp) against the Python chem-stack oracle.

The C++ engine replicates molblock semantics -> sanitize -> explicit-H
removal -> wedge/EZ stereo -> canonical isomeric SMILES
(assemble._graph_to_smiles). These tests assert EXACT string agreement
over generated corpora plus targeted edge cases (aromatic salvage,
rejection parity), and that the corpus actually covers the features the
port must get right (stereo wedges, charges, aromatics, hetero hnums).
"""

import os
import random
import subprocess
import sys
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from abcnet_tpu.data.encode import (encode_targets_np, parse_atoms_string,
                                    parse_bonds_string)
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.infer import extract_peaks
from abcnet_tpu.infer.assemble import (_graph_to_smiles, assemble_smiles,
                                       assemble_smiles_native)
from abcnet_tpu.data import vocab
from abcnet_tpu.infer.native import (assemble_graph_native,
                                     graph_to_smiles_native, load_native)

sys.path.insert(0, os.path.join(REPO, "tests"))
from test_decode_assemble import fake_logits_from_targets


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True,
                   capture_output=True)
    load_native.cache_clear()
    assert load_native() is not None


def _peaks_for_seed(seed: int):
    rng = random.Random(seed)
    sample = generate_sample(rng, mode="mixed")
    if sample is None:
        return None
    atoms = parse_atoms_string(sample.atoms_string)
    bonds = parse_bonds_string(sample.bonds_string)
    targets = encode_targets_np(atoms, bonds)
    return {k: np.asarray(v) for k, v in
            extract_peaks(fake_logits_from_targets(targets)).items()}


def test_corpus_exact_agreement_with_coverage():
    """150-molecule corpus: the native path must reproduce the Python
    path character-for-character, and the corpus must contain the
    features whose port is non-trivial (wedge/hash stereo, charges,
    aromatic records, heteroatom hnums)."""
    n_match = n_total = 0
    cover = {"stereo": 0, "charge": 0, "aromatic": 0, "hnum": 0,
             "nonnull": 0}
    t_py = t_cc = 0.0
    mismatches = []
    for seed in range(7000, 7150):
        peaks = _peaks_for_seed(seed)
        if peaks is None:
            continue
        graph = assemble_graph_native(peaks, 0)
        if graph is not None:
            _, _, charges_cls, _, _, orders = graph
            if any(int(o) in (5, 6) for o in orders):
                cover["stereo"] += 1
            if any(int(c) != 0 for c in charges_cls):
                cover["charge"] += 1
            if any(int(o) == 4 for o in orders):
                cover["aromatic"] += 1
        t0 = time.perf_counter()
        py = assemble_smiles(peaks, 0)
        t1 = time.perf_counter()
        cc = assemble_smiles_native(peaks, 0)
        t2 = time.perf_counter()
        t_py += t1 - t0
        t_cc += t2 - t1
        n_total += 1
        if py is not None:
            cover["nonnull"] += 1
            if "H" in py and "[" in py:
                cover["hnum"] += 1
        if py == cc:
            n_match += 1
        elif len(mismatches) < 5:
            mismatches.append((seed, py, cc))
    print(f"native-smiles corpus: {n_match}/{n_total} exact, "
          f"coverage={cover}, py={t_py:.2f}s cc={t_cc:.2f}s "
          f"({t_py / max(t_cc, 1e-9):.1f}x)")
    assert n_total >= 100
    assert cover["nonnull"] >= 80
    assert cover["stereo"] >= 5, cover
    assert cover["charge"] >= 3, cover
    assert cover["aromatic"] >= 20, cover
    assert n_match == n_total, f"mismatches: {mismatches}"


def test_direct_graph_salvage_and_rejection_parity():
    """Directly-fed graphs: (a) an odd aromatic path that cannot
    kekulize -> both engines take the salvage branch and agree;
    (b) salvage disabled -> both reject (None)."""
    # 3-ring of aromatic bonds over carbons: kekulization must fail.
    pos = np.array([[10.0, 10.0], [20.0, 10.0], [15.0, 18.0]])
    tcls = np.array([vocab.ATOM_VOCAB["C"]] * 3, np.int32)
    ccls = np.zeros(3, np.int32)
    hs = np.array([-1, -1, -1], np.int32)
    pairs = np.array([[0, 1], [1, 2], [2, 0]], np.int32)
    orders4 = np.array([4, 4, 4], np.int32)

    types = ["C", "C", "C"]
    charges = [0, 0, 0]
    py = _graph_to_smiles(types, charges, pos.tolist(), [-1] * 3,
                          [[1, 2], [2, 3], [3, 1]], [4, 4, 4])
    cc = graph_to_smiles_native(pos, tcls, ccls, hs, pairs, orders4)
    assert py == cc, (py, cc)
    assert py is not None  # salvage demotes to single bonds

    py2 = _graph_to_smiles(types, charges, pos.tolist(), [-1] * 3,
                           [[1, 2], [2, 3], [3, 1]], [4, 4, 4],
                           salvage_aromatic=False)
    cc2 = graph_to_smiles_native(pos, tcls, ccls, hs, pairs, orders4,
                                 salvage_aromatic=False)
    assert py2 is None and cc2 is None, (py2, cc2)


def test_direct_graph_charge_and_hnum():
    """Charged quaternary N and an explicit-hnum oxygen through both
    engines."""
    # [N+](C)(C)(C)C — tetramethylammonium
    pos = np.array([[20.0, 20.0], [10.0, 20.0], [30.0, 20.0],
                    [20.0, 10.0], [20.0, 30.0]])
    tcls = np.array([vocab.ATOM_VOCAB["N"]] + [vocab.ATOM_VOCAB["C"]] * 4,
                    np.int32)
    ccls = np.array([vocab.CHARGE_VOCAB[1], 0, 0, 0, 0], np.int32)
    hs = np.full(5, -1, np.int32)
    pairs = np.array([[0, 1], [0, 2], [0, 3], [0, 4]], np.int32)
    orders = np.ones(4, np.int32)
    py = _graph_to_smiles(["N", "C", "C", "C", "C"], [1, 0, 0, 0, 0],
                          pos.tolist(), [-1] * 5,
                          [[1, 2], [1, 3], [1, 4], [1, 5]], [1, 1, 1, 1])
    cc = graph_to_smiles_native(pos, tcls, ccls, hs, pairs, orders)
    assert py == cc and py is not None, (py, cc)
