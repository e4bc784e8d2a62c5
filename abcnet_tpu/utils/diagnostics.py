"""Diagnostic helpers: perfect-prediction logits from dense targets.

Lifting ground-truth target maps to "what a perfectly trained network
would output" exercises the whole decode+assembly stack without a
model — the strongest correctness check available without training
(used by tests/test_decode_assemble.py and scripts/decode_ceiling.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..data import vocab


def perfect_logits_production(sample):
    """Perfect logits via the PRODUCTION XLA target builder
    (ops/targets.py max-combine scatter) — what the trained model is
    actually taught. encode_targets_np instead preserves the
    reference's sequential-overwrite artifact (utils.py:143-166 writes
    bonds in order, so a later bond's 0.8 halo erases an earlier
    bond's 1.0 center in crowded regions); ceiling numbers should be
    measured against the production semantics."""
    import numpy as np

    from ..data.encode import (compact_labels, parse_atoms_string,
                               parse_bonds_string)
    from ..ops.targets import build_targets

    labels = compact_labels(parse_atoms_string(sample.atoms_string),
                            parse_bonds_string(sample.bonds_string),
                            1.0, 1.0, 0, 0)
    batch = {k: np.asarray(v)[None] for k, v in labels.items()}
    t = build_targets(batch, with_full_type=True)
    t = {k: np.asarray(v)[0] for k, v in t.items()}
    t.pop("bond_type_mass", None)
    return fake_logits_from_targets(t)


def fake_logits_from_targets(t):
    """Dense channel-first target maps -> NHWC 'perfect' logits."""
    g = t["atom_target"].shape[-1]

    def sig(x):          # sigmoid-head: center 5, halo 3, bg -5
        return x * 10.0 - 5.0

    atom_target = sig(t["atom_target"])[None].transpose(0, 2, 3, 1)
    bond_target = sig(t["bond_target"])[None].transpose(0, 2, 3, 1)
    atom_type = (t["atom_type"] * 10.0)[None].transpose(0, 2, 3, 1)
    atom_charge = (t["atom_charge"] * 10.0)[None].transpose(0, 2, 3, 1)
    atom_hs = (t["atom_hs"] * 10.0)[None].transpose(0, 2, 3, 1)
    bond_omega = sig(t["bond_omega"])[None].transpose(0, 2, 3, 1)
    bond_rho = t["bond_rho"][None].transpose(0, 2, 3, 1)
    bt = (t["bond_type"] * 10.0).transpose(2, 3, 0, 1)   # (G,G,6,60)
    bond_type = bt.reshape(g, g, -1)[None]
    return {
        "atom_target": jnp.asarray(atom_target),
        "atom_type": jnp.asarray(atom_type),
        "atom_charge": jnp.asarray(atom_charge),
        "atom_hs": jnp.asarray(atom_hs),
        "bond_target": jnp.asarray(bond_target),
        "bond_type": jnp.asarray(bond_type),
        "bond_rho": jnp.asarray(bond_rho),
        "bond_omega": jnp.asarray(bond_omega),
    }
