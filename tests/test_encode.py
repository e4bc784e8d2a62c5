"""Target-encoding golden tests against hand-computed reference semantics
(/root/reference/src/utils.py:83-228)."""

import math

import numpy as np
import pytest

from abcnet_tpu.data import vocab
from abcnet_tpu.data.encode import (AtomLabel, BondLabel, compact_labels,
                                    encode_targets_np, parse_atoms_string,
                                    parse_bonds_string)


def test_parse_label_strings():
    atoms = parse_atoms_string("C:292,380,0,-1;n:351,389,1,0;")
    assert atoms[0].symbol == "C" and atoms[0].hnums == -1
    # single-char symbols are uppercased (utils.py:96-97)
    assert atoms[1].symbol == "N" and atoms[1].charge == 1
    assert atoms[1].hnums == 0
    bonds = parse_bonds_string("4:321,384,29,4,0,0;1:10,20,-5,3,6,1;")
    assert bonds[0].btype == 4 and bonds[0].dx == 29
    assert bonds[1].stereo == 6 and bonds[1].direction == 1


def test_atom_encoding_halo():
    atoms = [AtomLabel("N", 40, 80, -1, 1)]
    t = encode_targets_np(atoms, [])
    x, y = 40 // 4, 80 // 4
    assert t["atom_target"][0, x, y] == 1.0
    assert t["atom_target"][0, x - 1, y] == 0.8
    assert t["atom_target"][0, x + 1, y + 1] == 0.8
    assert t["atom_target"][0, x + 2, y] == 0.0
    nidx = vocab.ATOM_VOCAB["N"]
    assert t["atom_type"][nidx, x, y] == 1.0
    assert t["atom_type"][nidx, x, y - 1] == 0.5
    cidx = vocab.CHARGE_VOCAB[-1]
    assert t["atom_charge"][cidx, x, y] == 1.0
    assert t["atom_hs"][1, x, y] == 1.0
    assert t["atom_hs"][0].sum() == 0


def test_atom_edge_clamp():
    atoms = [AtomLabel("C", 0, 0, 0, -1)]
    t = encode_targets_np(atoms, [])
    assert t["atom_target"][0, 0, 0] == 1.0
    assert t["atom_target"][0, 1, 1] == 0.8


def test_plain_bond_two_directions():
    # Horizontal-ish bond: dx=8 px, dy=0 -> omega = atan(0) = 0,
    # omega_idx = floor((0 + pi/2) / (pi/30)) = 15.
    bonds = [BondLabel(1, 100, 200, 8, 0, 0, 0)]
    t = encode_targets_np([], bonds)
    x, y = 25, 50
    rho = 2.0  # 8 px / stride 4
    assert t["bond_target"][0, x, y] == 1.0
    assert t["bond_omega"][15, x, y] == 1.0
    assert t["bond_omega"][45, x, y] == 1.0  # antipodal duplicate
    assert t["bond_omega"][14, x, y] == 0.8
    assert t["bond_omega"][16, x + 1, y - 1] == 0.8
    assert t["bond_rho"][15, x, y] == pytest.approx(rho)
    assert t["bond_rho"][44, x, y] == pytest.approx(rho)
    assert t["bond_type"][0, 15, x, y] == 1.0
    assert t["bond_type"][0, 46, x, y] == 0.5
    # Other classes empty.
    assert t["bond_type"][1].sum() == 0


def test_bond_dx0_canonicalization():
    # Vertical bond dx=0, dy>0: direction forced to 1, dy -> -|dy|
    # omega = atan(-dy/(0+1e-6)) ~ -pi/2 -> omega_idx = 0, wrap row 59.
    bonds = [BondLabel(2, 40, 40, 0, 8, 0, 0)]
    t = encode_targets_np([], bonds)
    x = y = 10
    assert t["bond_omega"][0, x, y] == 1.0
    assert t["bond_omega"][59, x, y] == 0.8  # wrap row written at 0.8
    assert t["bond_omega"][30, x, y] == 1.0  # antipodal
    assert t["bond_type"][1, 0, x, y] == 1.0


def test_wedge_single_direction():
    # Wedge bond (stereo=1) with direction=1: only omega_idx+30 written.
    bonds = [BondLabel(1, 80, 80, 8, 0, 1, 1)]
    t = encode_targets_np([], bonds)
    x = y = 20
    assert t["bond_omega"][45, x, y] == 1.0
    assert t["bond_omega"][15, x, y] == 0.0  # no antipodal for stereo bonds
    assert t["bond_type"][4, 45, x, y] == 1.0
    assert t["bond_type"][0].sum() == 0


def test_hash_maps_to_class5():
    bonds = [BondLabel(1, 80, 80, 8, 0, 6, 0)]
    t = encode_targets_np([], bonds)
    assert t["bond_type"][5].sum() > 0
    assert t["bond_type"][4].sum() == 0


def test_aromatic_bond_class3():
    bonds = [BondLabel(4, 80, 80, 8, 4, 0, 0)]
    t = encode_targets_np([], bonds)
    assert t["bond_type"][3].sum() > 0


def test_scale_and_pad_offsets():
    atoms = [AtomLabel("C", 100, 100, 0, -1)]
    t = encode_targets_np(atoms, [], scale_x=0.9, scale_y=1.0, ddx=25, ddy=0)
    x = int(100 * 0.9 + 25) // 4  # = 28
    assert t["atom_target"][0, x, 25] == 1.0


def test_compact_labels_match_dense():
    atoms = [AtomLabel("O", 40, 80, 1, 0), AtomLabel("C", 200, 300, 0, -1)]
    bonds = [BondLabel(2, 100, 200, 8, 6, 0, 0),
             BondLabel(1, 300, 300, 6, 0, 1, 0)]
    dense = encode_targets_np(atoms, bonds)
    comp = compact_labels(atoms, bonds)
    assert comp["n_atoms"] == 2
    # plain bond duplicated into 2 entries, wedge single
    assert comp["n_bonds"] == 3
    # Centers agree with dense maps.
    for k in range(comp["n_atoms"]):
        x, y, tidx, cidx, hs = comp["atoms"][k]
        assert dense["atom_target"][0, x, y] == 1.0
        assert dense["atom_type"][tidx, x, y] == 1.0
    for k in range(comp["n_bonds"]):
        x, y, tidx, oidx = comp["bonds_i"][k]
        rho = comp["bonds_f"][k, 0]
        assert dense["bond_omega"][oidx, x, y] == 1.0
        assert dense["bond_type"][tidx, oidx, x, y] == 1.0
        assert dense["bond_rho"][oidx, x, y] == pytest.approx(rho)


def test_generated_sample_encodes():
    """End-to-end: generator sample -> parse -> encode without error and
    with plausible mass."""
    import random
    from abcnet_tpu.data.generate import generate_sample
    rng = random.Random(3)
    s = None
    while s is None:
        s = generate_sample(rng)
    atoms = parse_atoms_string(s.atoms_string)
    bonds = parse_bonds_string(s.bonds_string)
    t = encode_targets_np(atoms, bonds)
    n_atom_peaks = int((t["atom_target"][0] == 1.0).sum())
    assert n_atom_peaks >= len(atoms) * 0.9
    assert (t["bond_target"][0] == 1.0).sum() >= 1
