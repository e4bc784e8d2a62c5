"""Self-loop bond re-matching (atom-drop regression, VERDICT r4 #4).

Geometry distilled from the r4 failure taxonomy's atoms-1 bucket: a
terminal C-O bond whose predicted delta is undershot, so BOTH endpoint
scores argmin to the inner carbon. The reference drops the bond as a
self-loop (img2smiles2.py:217-219), which also drops the degree-1
oxygen at the unbonded-atom stage — the molecule loses an atom despite
the detector having found it. With REMATCH_MAX the matcher moves the
cheaper endpoint to its runner-up (the true oxygen) instead.

Scores for the terminal bond (center (15,10), delta (1,0)):
  end side   p1=(16,10): C@(14,10) -> 2.0 ; O@(17,11) -> 0.5+2.0=2.5
  begin side p2=(14,10): C exact 0 ; every alternative > REMATCH_MAX
so the initial match self-loops on C and the re-match resolves to
(C, O) at runner-up cost 2.5 <= 3.0. rematch_max=0 must reproduce the
reference drop exactly.
"""

import numpy as np
import pytest

from abcnet_tpu.data import vocab
from abcnet_tpu.infer.assemble import assemble_smiles, assemble_smiles_native
from abcnet_tpu.infer.native import load_native


def _peaks():
    t = [vocab.ATOM_VOCAB["C"], vocab.ATOM_VOCAB["C"],
         vocab.ATOM_VOCAB["O"]]
    return {
        "atom_xy": np.array([[[10, 10], [14, 10], [17, 11]]], np.int32),
        "atom_type": np.array([t], np.int32),
        "atom_charge": np.zeros((1, 3), np.int32),
        "atom_hs": np.zeros((1, 3), np.int32),
        "atom_valid": np.ones((1, 3), bool),
        # bond 0: clean C-C. bond 1: undershot terminal C-O.
        "bond_xy": np.array([[[12, 10], [15, 10]]], np.int32),
        "bond_delta": np.array([[[2.0, 0.0], [1.0, 0.0]]], np.float32),
        "bond_type": np.zeros((1, 2), np.int32),
        "bond_valid": np.ones((1, 2), bool),
        "atom_score": np.ones((1, 3), np.float32),
        "bond_score": np.ones((1, 2), np.float32),
    }


def test_rematch_recovers_terminal_atom():
    s = assemble_smiles(_peaks(), 0)              # default REMATCH_MAX
    assert s is not None and "O" in s and s.count("C") == 2, s


def test_rematch_zero_reproduces_reference_drop():
    s = assemble_smiles(_peaks(), 0, rematch_max=0.0)
    assert s is not None and "O" not in s and s.count("C") == 2, s


def test_rematch_does_not_invent_far_bonds():
    """With the true terminal atom far away (> REMATCH_MAX on both
    sides), the self-loop bond must still be dropped."""
    p = _peaks()
    p["atom_xy"] = np.array([[[10, 10], [14, 10], [24, 18]]], np.int32)
    s = assemble_smiles(p, 0)
    assert s is not None and "O" not in s and s.count("C") == 2, s


@pytest.mark.skipif(load_native() is None,
                    reason="native assembler not built")
def test_native_matches_numpy_rematch():
    for rm in (3.0, 0.0):
        a = assemble_smiles(_peaks(), 0, rematch_max=rm)
        b = assemble_smiles_native(_peaks(), 0, rematch_max=rm)
        assert a == b, (rm, a, b)
