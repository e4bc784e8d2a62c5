"""Golden tests: on-device scatter targets and losses vs an independent
numpy transliteration of the reference math (train.py:95-137)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from abcnet_tpu.data import vocab
from abcnet_tpu.data.encode import (compact_labels, encode_targets_np,
                                    parse_atoms_string, parse_bonds_string)
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.ops.losses import (activations, compute_losses, total_loss,
                                   S_INDEX)
from abcnet_tpu.ops.targets import build_targets

G = vocab.GRID
NO = vocab.NUM_OMEGA_BINS
NB = vocab.NUM_BOND_CLASSES


def _sample_labels(seed):
    rng = random.Random(seed)
    s = None
    while s is None:
        s = generate_sample(rng)
    atoms = parse_atoms_string(s.atoms_string)
    bonds = parse_bonds_string(s.bonds_string)
    return atoms, bonds


@pytest.fixture(scope="module")
def batch_and_dense():
    all_comp = []
    all_dense = []
    for seed in (11, 22):
        atoms, bonds = _sample_labels(seed)
        all_comp.append(compact_labels(atoms, bonds))
        all_dense.append(encode_targets_np(atoms, bonds))
    batch = {k: np.stack([c[k] for c in all_comp]) for k in all_comp[0]}
    dense = {k: np.stack([d[k] for d in all_dense]) for k in all_dense[0]}
    return batch, dense


def test_scatter_targets_match_numpy_dense(batch_and_dense):
    batch, dense = batch_and_dense
    built = jax.jit(lambda b: build_targets(b, with_full_type=True))(
        {k: jnp.asarray(v) for k, v in batch.items()})
    built = jax.device_get(built)
    for key in ("atom_target", "atom_type", "atom_charge", "atom_hs",
                "bond_target", "bond_omega", "bond_rho", "bond_type"):
        got = built[key]
        want = dense[key]
        mismatch = np.abs(got - want) > 1e-5
        frac = mismatch.mean()
        # max-combine vs sequential overwrite may differ on overlapping
        # halos; must be a tiny fraction of cells on generated data.
        assert frac < 2e-3, f"{key}: mismatch fraction {frac}"

    # bond_type_mass equals the class-sum of the dense bond_type almost
    # everywhere (same overlap caveat).
    mass_want = dense["bond_type"].sum(axis=1)
    frac = (np.abs(built["bond_type_mass"] - mass_want) > 1e-5).mean()
    assert frac < 2e-3


def _np_reference_losses(preds_nhwc, dense):
    """Independent numpy implementation of the 8 loss terms."""
    def clamp(p):
        return np.clip(p, 1e-5, 1 - 1e-5)

    def softmax(x, axis):
        x = x - x.max(axis=axis, keepdims=True)
        e = np.exp(x)
        return e / e.sum(axis=axis, keepdims=True)

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    # Convert NHWC logits to NCHW to line up with dense targets.
    p_at = clamp(sigmoid(preds_nhwc["atom_target"]))[..., 0]
    t_at = dense["atom_target"][:, 0]
    p_bt = clamp(sigmoid(preds_nhwc["bond_target"]))[..., 0]
    t_bt = dense["bond_target"][:, 0]

    def heat(p, t):
        pos = (t == 1.0).astype(np.float64)
        return (np.sum(-pos * (1 - p) ** 2 * np.log(p)
                       - (1 - t) ** 4 * p ** 2 * np.log(1 - p))
                / pos.sum())

    out = {}
    out["atom_target"] = heat(p_at, t_at)
    out["bond_target"] = heat(p_bt, t_bt)

    w = np.asarray(vocab.ATOM_TYPE_WEIGHTS, np.float32)
    p = clamp(softmax(preds_nhwc["atom_type"], -1))      # (B,G,G,14)
    t = np.moveaxis(dense["atom_type"], 1, -1)
    out["atom_type"] = np.sum(-w * t * (1 - p) ** 2 * np.log(p)) / t.sum()

    p = clamp(softmax(preds_nhwc["atom_charge"], -1))
    t = np.moveaxis(dense["atom_charge"], 1, -1)
    out["atom_charge"] = np.sum(-t * (1 - p) ** 2 * np.log(p)) / t.sum()

    p = clamp(softmax(preds_nhwc["atom_hs"], -1))
    t = np.moveaxis(dense["atom_hs"], 1, -1)
    out["atom_hs"] = np.sum(-t * (1 - p) ** 2 * np.log(p)) / (t.sum() + 0.1)

    bt = preds_nhwc["bond_type"].reshape(
        preds_nhwc["bond_type"].shape[:3] + (NB, NO))
    p = clamp(softmax(bt, 3))                             # (B,G,G,6,60)
    t = np.transpose(dense["bond_type"], (0, 3, 4, 1, 2))
    out["bond_type"] = np.sum(-t * (1 - p) ** 2 * np.log(p)) / t.sum()

    mass = np.transpose(dense["bond_type"].sum(axis=1), (0, 2, 3, 1))
    rho_p = np.abs(preds_nhwc["bond_rho"])
    rho_t = np.moveaxis(dense["bond_rho"], 1, -1)
    out["bond_rho"] = np.sum(np.abs(rho_p - rho_t) * mass) / mass.sum()

    p = clamp(sigmoid(preds_nhwc["bond_omega"]))
    t = np.moveaxis(dense["bond_omega"], 1, -1)
    cell_mass = t.sum(-1, keepdims=True)
    pos = (t == 1.0).astype(np.float64)
    inner = (pos * (1 - p) ** 2 * np.log(p)
             + (1 - t) ** 4 * p ** 2 * np.log(1 - p))
    out["bond_omega"] = -np.sum(cell_mass * inner) / t.sum()
    return out


@pytest.fixture(scope="module")
def fake_preds():
    rng = np.random.default_rng(0)
    B = 2
    return {
        "atom_target": rng.normal(size=(B, G, G, 1)).astype(np.float32),
        "atom_type": rng.normal(size=(B, G, G, 14)).astype(np.float32),
        "atom_charge": rng.normal(size=(B, G, G, 3)).astype(np.float32),
        "atom_hs": rng.normal(size=(B, G, G, 2)).astype(np.float32),
        "bond_target": rng.normal(size=(B, G, G, 1)).astype(np.float32),
        "bond_type": rng.normal(size=(B, G, G, 360)).astype(np.float32),
        "bond_rho": rng.normal(size=(B, G, G, 60)).astype(np.float32),
        "bond_omega": rng.normal(size=(B, G, G, 60)).astype(np.float32),
    }


def test_losses_match_reference_math(batch_and_dense, fake_preds):
    batch, dense = batch_and_dense
    want = _np_reference_losses(fake_preds, dense)

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    jpreds = {k: jnp.asarray(v) for k, v in fake_preds.items()}
    targets = build_targets(jbatch, with_full_type=True)

    got_dense = jax.device_get(compute_losses(
        jpreds, targets, jbatch, fused_bond_type=False))
    for k, v in want.items():
        rel = abs(got_dense[k] - v) / (abs(v) + 1e-9)
        assert rel < 2e-3, f"dense {k}: got {got_dense[k]}, want {v}"

    got_fused = jax.device_get(compute_losses(
        jpreds, targets, jbatch, fused_bond_type=True))
    for k, v in want.items():
        tol = 2e-2 if k == "bond_type" else 2e-3
        rel = abs(got_fused[k] - v) / (abs(v) + 1e-9)
        assert rel < tol, f"fused {k}: got {got_fused[k]}, want {v}"


def test_total_loss_uncertainty_weighting(fake_preds):
    losses = {k: jnp.asarray(1.0) for k in S_INDEX}
    s = jnp.zeros(10)
    # exp(0) + 0 = 1 for all; rho gets 0.5*1+0 = 0.5.
    got = float(total_loss(losses, s))
    assert got == pytest.approx(len(S_INDEX) - 0.5)


def test_metrics_perfect_predictions(batch_and_dense):
    """Logit-space 'perfect' predictions should score ~1.0 across the
    metric suite."""
    from abcnet_tpu.train.metrics import compute_metrics, MeterBank
    batch, dense = batch_and_dense

    def logit(p):
        p = np.clip(p, 1e-4, 1 - 1e-4)
        return np.log(p / (1 - p))

    B = dense["atom_target"].shape[0]
    preds = {
        "atom_target": logit(np.transpose(dense["atom_target"],
                                          (0, 2, 3, 1)) == 1.0).astype(
                                              np.float32),
        "atom_type": 20 * np.moveaxis(dense["atom_type"], 1, -1),
        "atom_charge": 20 * np.moveaxis(dense["atom_charge"], 1, -1),
        "atom_hs": 20 * np.moveaxis(dense["atom_hs"], 1, -1),
        "bond_target": logit(np.transpose(dense["bond_target"],
                                          (0, 2, 3, 1)) == 1.0).astype(
                                              np.float32),
        "bond_type": 20 * np.transpose(dense["bond_type"],
                                       (0, 3, 4, 1, 2)).reshape(
                                           B, G, G, 360),
        "bond_rho": np.moveaxis(dense["bond_rho"], 1, -1),
        "bond_omega": logit(np.moveaxis(dense["bond_omega"], 1, -1)
                            == 1.0).astype(np.float32),
    }
    # bond_type pred reshape must interleave (6, 60) the same way the
    # loss does: (B,G,G,6,60) -> flatten last two.
    targets_nhwc = {
        "atom_target": jnp.asarray(np.transpose(dense["atom_target"],
                                                (0, 2, 3, 1))),
        "atom_type": jnp.asarray(np.moveaxis(dense["atom_type"], 1, -1)),
        "atom_charge": jnp.asarray(np.moveaxis(dense["atom_charge"], 1, -1)),
        "atom_hs": jnp.asarray(np.moveaxis(dense["atom_hs"], 1, -1)),
        "bond_target": jnp.asarray(np.transpose(dense["bond_target"],
                                                (0, 2, 3, 1))),
        "bond_type": jnp.asarray(np.transpose(dense["bond_type"],
                                              (0, 3, 4, 1, 2))),
        "bond_type_mass": jnp.asarray(np.moveaxis(
            dense["bond_type"].sum(axis=1), 1, -1)),
        "bond_rho": jnp.asarray(np.moveaxis(dense["bond_rho"], 1, -1)),
        "bond_omega": jnp.asarray(np.moveaxis(dense["bond_omega"], 1, -1)),
    }
    jpreds = {k: jnp.asarray(v) for k, v in preds.items()}
    metrics = compute_metrics(jpreds, targets_nhwc)
    bank = MeterBank()
    bank.update(metrics)
    avg = bank.averages()
    for name in ("atom_target_precision", "atom_target_recall",
                 "bond_target_precision", "bond_target_recall",
                 "atom_types_acc", "atom_charges_acc", "bond_types_acc",
                 "bond_omega_precision", "bond_omega_recall"):
        assert avg[name] > 0.97, f"{name} = {avg[name]}"
    assert avg["bond_rhos_mae"] < 1e-5
