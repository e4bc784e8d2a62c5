"""Endpoint-matching overshoot cap (crowded-drawing regression).

Distilled from indigo seed 1035 (decode-ceiling residual): a bond
endpoint at ~(80.0, 70.5) whose true atom (N at (81.0, 71.25)) sits
~1.2 grid units off-axis, while a fluorine at (81.75, 67.0) lies
~3.9 units BEYOND the endpoint but almost exactly on the bond axis.
The reference score halves along-axis overshoot without limit
(img2smiles2.py:20-22), so F wins by 0.02 and a phantom long bond is
assembled; with the overshoot cap the true atom wins. Cap 0 must
reproduce the reference choice (documented divergence switch).
"""

import numpy as np
import pytest

from abcnet_tpu.infer.assemble import assemble_smiles, assemble_smiles_native
from abcnet_tpu.infer.native import load_native


def _peaks():
    """One bond (center (79,73), delta (0.96,-2.51)) and three atoms:
    C at the begin side, N (true end atom), F (axis-aligned far atom)."""
    atom_xy = np.array([[[78, 76], [81, 71], [81, 67]]], np.int32)
    # C, N, F (vocab indices: C=1, N=2, F=5 per data/vocab.py)
    from abcnet_tpu.data import vocab
    t = [vocab.ATOM_VOCAB["C"], vocab.ATOM_VOCAB["N"], vocab.ATOM_VOCAB["F"]]
    peaks = {
        "atom_xy": atom_xy,
        "atom_type": np.array([t], np.int32),
        "atom_charge": np.zeros((1, 3), np.int32),
        "atom_hs": np.zeros((1, 3), np.int32),
        "atom_valid": np.ones((1, 3), bool),
        "bond_xy": np.array([[[79, 73]]], np.int32),
        "bond_delta": np.array([[[0.96, -2.51]]], np.float32),
        "bond_type": np.zeros((1, 1), np.int32),   # single
        "bond_valid": np.ones((1, 1), bool),
        "atom_score": np.ones((1, 3), np.float32),
        "bond_score": np.ones((1, 1), np.float32),
    }
    return peaks


def test_cap_picks_true_offaxis_atom():
    s = assemble_smiles(_peaks(), 0)          # default cap
    assert s is not None and "N" in s and "F" not in s, s


def test_cap_zero_reproduces_reference_choice():
    s = assemble_smiles(_peaks(), 0, overshoot_cap=0.0)
    assert s is not None and "F" in s, s


@pytest.mark.skipif(load_native() is None,
                    reason="native assembler not built")
def test_native_matches_numpy_with_cap():
    for cap in (2.0, 0.0):
        a = assemble_smiles(_peaks(), 0, overshoot_cap=cap)
        b = assemble_smiles_native(_peaks(), 0, overshoot_cap=cap)
        assert a == b, (cap, a, b)


def test_aromatic_salvage():
    """Unkekulizable aromatic prediction (odd all-carbon cycle) decodes
    best-effort instead of None (reference's MolFromMolBlock returns
    None there); salvage off reproduces the reference behavior."""
    from abcnet_tpu.infer.assemble import _graph_to_smiles
    types = ["C"] * 5
    charges = [0] * 5
    pos = [[0, 0], [0, 4], [4, 6], [8, 3], [4, -2]]
    hs = [-1] * 5
    pairs = [[1, 2], [2, 3], [3, 4], [4, 5], [5, 1]]
    orders = [4] * 5
    assert _graph_to_smiles(types, charges, pos, hs, pairs, orders,
                            salvage_aromatic=False) is None
    s = _graph_to_smiles(types, charges, pos, hs, pairs, orders)
    assert s is not None and s.count("C") == 5, s
