"""Per-class P/R tables (test_accuracy.py parity) — unit test with
hand-constructed peaks where every count is known."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from abcnet_tpu.data import vocab
from abcnet_tpu.eval.class_metrics import per_class_counts, per_class_report

G = vocab.GRID


def _sig(x):
    return x * 10.0 - 5.0


def test_per_class_counts_known_configuration():
    """One C atom predicted exactly, one N predicted one cell off
    (counts via 3x3 tolerance), one O missed entirely."""
    atom_t = np.zeros((1, G, G, 1), np.float32)
    atom_type_t = np.zeros((1, G, G, vocab.NUM_ATOM_CLASSES), np.float32)
    charge_t = np.zeros((1, G, G, vocab.NUM_CHARGE_CLASSES), np.float32)
    hs_t = np.zeros((1, G, G, 2), np.float32)
    C, N, O = (vocab.ATOM_VOCAB[s] for s in ("C", "N", "O"))

    # truth: C at (10,10), N at (20,20), O at (30,30)
    for (x, y), cls in (((10, 10), C), ((20, 20), N), ((30, 30), O)):
        atom_t[0, x, y, 0] = 1.0
        atom_type_t[0, x, y, cls] = 1.0
    charge_t[..., 0] = 1.0

    # prediction logits: C at (10,10), N at (21,20) — off by one cell
    atom_p = np.full((1, G, G, 1), -5.0, np.float32)
    type_p = np.zeros((1, G, G, vocab.NUM_ATOM_CLASSES), np.float32)
    for (x, y), cls in (((10, 10), C), ((21, 20), N)):
        atom_p[0, x, y, 0] = 5.0
        type_p[0, x, y, cls] = 10.0
    charge_p = np.zeros((1, G, G, vocab.NUM_CHARGE_CLASSES), np.float32)
    charge_p[..., 0] = 10.0

    preds = {
        "atom_target": jnp.asarray(atom_p),
        "atom_type": jnp.asarray(type_p),
        "atom_charge": jnp.asarray(charge_p),
        "atom_hs": jnp.zeros((1, G, G, 2), jnp.float32),
        "bond_target": jnp.full((1, G, G, 1), -5.0, jnp.float32),
        "bond_type": jnp.zeros((1, G, G, 360), jnp.float32),
        "bond_rho": jnp.zeros((1, G, G, 60), jnp.float32),
        "bond_omega": jnp.full((1, G, G, 60), -5.0, jnp.float32),
    }
    targets = {
        "atom_target": jnp.asarray(atom_t),
        "atom_type": jnp.asarray(atom_type_t),
        "atom_charge": jnp.asarray(charge_t),
        "atom_hs": jnp.asarray(hs_t),
        "bond_target": jnp.zeros((1, G, G, 1), jnp.float32),
    }
    counts = {k: tuple(np.asarray(x) for x in v)
              for k, v in per_class_counts(preds, targets).items()}

    tp_p, n_p, tp_r, n_t = counts["atom_type"]
    assert n_t[C] == 1 and n_t[N] == 1 and n_t[O] == 1
    assert n_p[C] == 1 and n_p[N] == 1 and n_p[O] == 0
    assert tp_p[C] == 1          # exact hit
    assert tp_p[N] == 1          # one-off counts within 3x3 tolerance
    assert tp_r[O] == 0          # miss
    report = per_class_report(counts)
    assert "precision=1.0000" in report and "== atom_type ==" in report
