"""Sub-cell peak refinement (infer/decode.py:subcell_offsets and its
consumption by the host matchers).

Covers:
  * the parabolic offset recovers a known sub-cell maximum from a
    quadratic logit surface, and is exactly zero on a delta peak
    (perfect-target decode stays bit-identical);
  * numpy and C++ assemblers agree when atom_sub/bond_sub are present;
  * subcell=False (or absent arrays) reproduces the integer-cell
    matching exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from abcnet_tpu.infer import assemble, decode
from abcnet_tpu.infer.native import load_native


def _parabola_map(cx, cy, curv=1.0):
    """Logit surface -curv*((x-cx)^2+(y-cy)^2) on a 32x32 grid."""
    xs = np.arange(32, dtype=np.float64)
    g = -(curv * ((xs[:, None] - cx) ** 2 + (xs[None, :] - cy) ** 2))
    return jnp.asarray(g[None], jnp.float32)


def test_offsets_recover_subcell_maximum():
    for cx, cy in [(10.3, 20.0), (15.0, 7.75), (9.51, 12.49)]:
        logit = _parabola_map(cx, cy)
        xs = jnp.asarray([[int(round(cx))]])
        ys = jnp.asarray([[int(round(cy))]])
        off = np.asarray(decode.subcell_offsets(logit, xs, ys))[0, 0]
        assert abs(float(xs[0, 0]) + off[0] - cx) < 1e-3
        assert abs(float(ys[0, 0]) + off[1] - cy) < 1e-3


def test_offsets_zero_on_delta_peak():
    logit = jnp.full((1, 32, 32), -10.0).at[0, 5, 9].set(3.0)
    off = np.asarray(decode.subcell_offsets(
        logit, jnp.asarray([[5]]), jnp.asarray([[9]])))[0, 0]
    np.testing.assert_allclose(off, 0.0, atol=1e-6)


def test_offsets_clipped_to_half_cell():
    # Monotone ramp: parabola denominator ~0 -> offset must clip.
    logit = jnp.asarray(
        np.linspace(0, 10, 32, dtype=np.float32)[None, None, :]
        * np.ones((1, 32, 1), np.float32))
    off = np.asarray(decode.subcell_offsets(
        logit, jnp.asarray([[16]]), jnp.asarray([[16]])))[0, 0]
    assert np.all(np.abs(off) <= 0.49 + 1e-6)


def _toy_peaks(with_sub):
    """Two atoms 2.2 cells apart + one bond; the refined coordinates
    pull the endpoint toward the true atom."""
    peaks = {
        "atom_xy": np.asarray([[[10, 10], [10, 12], [0, 0]]], np.int32),
        "atom_type": np.asarray([[1, 3, 0]], np.int32),     # C, O
        "atom_charge": np.zeros((1, 3), np.int32),
        "atom_hs": np.zeros((1, 3), np.int32),
        "atom_valid": np.asarray([[True, True, False]]),
        "bond_xy": np.asarray([[[10, 11], [0, 0]]], np.int32),
        "bond_delta": np.asarray([[[0.0, 1.1], [0, 0]]], np.float32),
        "bond_type": np.asarray([[0, 0]], np.int32),
        "bond_valid": np.asarray([[True, False]]),
    }
    if with_sub:
        peaks["atom_sub"] = np.asarray(
            [[[0.3, -0.2], [-0.1, 0.4], [0, 0]]], np.float32)
        peaks["bond_sub"] = np.asarray([[[0.2, 0.1], [0, 0]]], np.float32)
    return peaks


def test_numpy_subcell_matches_integer_graph():
    # With well-separated atoms the refinement must not change the graph.
    smi_int = assemble.assemble_smiles(_toy_peaks(False), 0)
    smi_sub = assemble.assemble_smiles(_toy_peaks(True), 0)
    smi_off = assemble.assemble_smiles(_toy_peaks(True), 0, subcell=False)
    assert smi_int == smi_sub == smi_off == "CO"


@pytest.mark.skipif(load_native() is None, reason="native lib not built")
def test_native_numpy_agree_with_sub():
    rng = np.random.default_rng(7)
    for trial in range(20):
        ka, kb = 12, 16
        axy = rng.integers(0, 30, (1, ka, 2)).astype(np.int32)
        peaks = {
            "atom_xy": axy,
            "atom_type": rng.integers(1, 9, (1, ka)).astype(np.int32),
            "atom_charge": np.zeros((1, ka), np.int32),
            "atom_hs": np.zeros((1, ka), np.int32),
            "atom_valid": rng.random((1, ka)) < 0.8,
            "bond_xy": rng.integers(0, 30, (1, kb, 2)).astype(np.int32),
            "bond_delta": rng.normal(0, 2, (1, kb, 2)).astype(np.float32),
            "bond_type": rng.integers(0, 4, (1, kb)).astype(np.int32),
            "bond_valid": rng.random((1, kb)) < 0.8,
            "atom_sub": rng.uniform(-.49, .49, (1, ka, 2)).astype(
                np.float32),
            "bond_sub": rng.uniform(-.49, .49, (1, kb, 2)).astype(
                np.float32),
        }
        a = assemble.assemble_smiles(peaks, 0)
        b = assemble.assemble_smiles_native(peaks, 0)
        assert a == b, f"trial {trial}: {a} != {b}"


def test_extract_peaks_emits_sub_arrays():
    rng = np.random.default_rng(0)
    preds = {
        "atom_target": jnp.asarray(rng.normal(-4, 1, (1, 32, 32, 1)),
                                   jnp.float32),
        "atom_type": jnp.asarray(rng.normal(0, 1, (1, 32, 32, 14)),
                                 jnp.float32),
        "atom_charge": jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)),
                                   jnp.float32),
        "atom_hs": jnp.asarray(rng.normal(0, 1, (1, 32, 32, 2)),
                               jnp.float32),
        "bond_target": jnp.asarray(rng.normal(-4, 1, (1, 32, 32, 1)),
                                   jnp.float32),
        "bond_type": jnp.asarray(rng.normal(0, 1, (1, 32, 32, 360)),
                                 jnp.float32),
        "bond_omega": jnp.asarray(rng.normal(0, 1, (1, 32, 32, 60)),
                                  jnp.float32),
        "bond_rho": jnp.asarray(rng.normal(0, 1, (1, 32, 32, 60)),
                                jnp.float32),
    }
    cfg = decode.DecodeConfig(max_atoms=8, max_bonds=8)
    pk = decode.extract_peaks(preds, cfg)
    assert pk["atom_sub"].shape == (1, 8, 2)
    assert pk["bond_sub"].shape == (1, 8 * cfg.omega_per_bond, 2)
    assert np.all(np.abs(np.asarray(pk["atom_sub"])) <= 0.49 + 1e-6)
    cfg_off = decode.DecodeConfig(max_atoms=8, max_bonds=8, subcell=False)
    assert "atom_sub" not in decode.extract_peaks(preds, cfg_off)
