"""Valence-aware FP-bond prune (overdeg bucket, VERDICT r4 #4 tail).

Geometry distilled from the r5 probe's attribution
(logs/atom_drop_probe_r5.log: endpoint theft = 0, overdeg comes from
false-positive detected bonds): a carbon with four true single bonds
plus a fifth, low-confidence FP bond. The reference reacts to the
impossible valence by rewriting the ELEMENT (C -> P via
img2smiles2.py:258-271) — the elem-swap failure bucket. With
VPRUNE_SCORE_MAX the assembler instead drops the lowest-score incident
bond when that resolves the violation and both endpoints keep
degree >= 1; a high-score fifth bond must still take the reference
rewrite path.
"""

import numpy as np
import pytest

from abcnet_tpu.data import vocab
from abcnet_tpu.infer.assemble import assemble_smiles, assemble_smiles_native
from abcnet_tpu.infer.native import load_native


def _peaks(fp_score=0.5):
    t = [vocab.ATOM_VOCAB[e] for e in ("C", "C", "O", "N", "C", "C")]
    # atoms: C0 center, C1 right, O2 below, N3 left, C4 above, C5 diag
    return {
        "atom_xy": np.array([[[10, 10], [14, 10], [10, 14],
                              [6, 10], [10, 6], [14, 14]]], np.int32),
        "atom_type": np.array([t], np.int32),
        "atom_charge": np.zeros((1, 6), np.int32),
        "atom_hs": np.zeros((1, 6), np.int32),
        "atom_valid": np.ones((1, 6), bool),
        # bonds: 4 true singles at C0, one true C5-C1, one FP C0-C5.
        "bond_xy": np.array([[[12, 10], [10, 12], [8, 10],
                              [10, 8], [14, 12], [12, 12]]], np.int32),
        "bond_delta": np.array([[[2.0, 0.0], [0.0, 2.0], [2.0, 0.0],
                                 [0.0, 2.0], [0.0, 2.0], [2.0, 2.0]]],
                               np.float32),
        "bond_type": np.zeros((1, 6), np.int32),
        "bond_valid": np.ones((1, 6), bool),
        "atom_score": np.ones((1, 6), np.float32),
        "bond_score": np.array([[0.95, 0.95, 0.95, 0.95, 0.95,
                                 fp_score]], np.float32),
    }


def test_reference_rewrites_element():
    s = assemble_smiles(_peaks(), 0, vprune_score_max=0.0)  # reference
    assert s is not None and "P" in s, s


def test_default_gate_adopted():
    """Default = 0.85, adopted by the n=256 chip A/B
    (logs/vprune_r5d.log); the low-confidence fifth bond is pruned on
    the default path."""
    from abcnet_tpu.infer.assemble import VPRUNE_SCORE_MAX
    assert VPRUNE_SCORE_MAX == 0.85
    s = assemble_smiles(_peaks(), 0)
    assert s is not None and "P" not in s, s


def test_vprune_drops_fp_bond_instead():
    s = assemble_smiles(_peaks(), 0, vprune_score_max=0.8)
    assert s is not None and "P" not in s, s
    assert "O" in s and "N" in s and s.count("C") == 4, s


def test_vprune_respects_score_gate():
    """A confident fifth bond is NOT pruned: reference rewrite fires."""
    s = assemble_smiles(_peaks(fp_score=0.9), 0, vprune_score_max=0.8)
    assert s is not None and "P" in s, s


@pytest.mark.skipif(load_native() is None,
                    reason="native assembler not built")
def test_native_wrapper_routes_vprune():
    for vp in (0.8, 0.0):
        a = assemble_smiles(_peaks(), 0, vprune_score_max=vp)
        b = assemble_smiles_native(_peaks(), 0, vprune_score_max=vp)
        assert a == b, (vp, a, b)
