"""Inference-stack tests: targets -> fake logits -> peaks -> SMILES.

The strongest correctness check available without training: encode a
generated molecule's labels into dense target maps, lift them to
"perfect prediction" logits, and require the full decode+assembly
pipeline to reproduce the ground-truth canonical SMILES. Exercises NMS,
top-K peak extraction, circular-omega NMS, antipodal suppression,
rho/type lookups, endpoint matching, valence fixes, MolBlock round-trip
and SMILES canonicalization together.
"""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from abcnet_tpu.chem import canonical_smiles
from abcnet_tpu.data import vocab
from abcnet_tpu.data.encode import (compact_labels, encode_targets_np,
                                    parse_atoms_string, parse_bonds_string)
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.infer import assemble_batch, extract_peaks
from abcnet_tpu.infer.decode import _antipodal_keep
from abcnet_tpu.utils.diagnostics import fake_logits_from_targets

G = vocab.GRID


def test_antipodal_keep_plain_bond_tie():
    # Equal antipodal lobes: only the lower-direction bin survives.
    w = np.zeros((1, 60), np.float32)
    w[0, 7] = 1.0
    w[0, 37] = 1.0
    keep = np.asarray(_antipodal_keep(jnp.asarray(w)))[0]
    assert keep[7] and not keep[37]


def test_antipodal_keep_directional():
    # A dominant direction-resolved bin (wedge/hash case) survives alone.
    w = np.zeros((1, 60), np.float32)
    w[0, 42] = 1.0
    w[0, 12] = 0.4
    keep = np.asarray(_antipodal_keep(jnp.asarray(w)))[0]
    assert keep[42] and not keep[12]


def _roundtrip_one(seed, mode):
    rng = random.Random(seed)
    sample = generate_sample(rng, mode=mode)
    if sample is None:
        return None, None
    atoms = parse_atoms_string(sample.atoms_string)
    bonds = parse_bonds_string(sample.bonds_string)
    targets = encode_targets_np(atoms, bonds)
    preds = fake_logits_from_targets(targets)
    peaks = extract_peaks(preds)
    pred = assemble_batch(peaks)[0]
    return sample.smiles, pred


@pytest.mark.parametrize("mode", ["rdkit", "indigo"])
def test_roundtrip_from_perfect_targets(mode):
    hits, total = 0, 0
    for seed in range(30):
        truth, pred = _roundtrip_one(1000 + seed, mode)
        if truth is None:
            continue
        total += 1
        if pred is not None and \
                canonical_smiles(pred) == canonical_smiles(truth):
            hits += 1
    assert total >= 20
    # Perfect targets should decode nearly always; angle quantization
    # and peak-cell collisions account for the slack.
    assert hits / total >= 0.8, f"{hits}/{total} roundtrips matched"


def test_extract_peaks_shapes():
    rng = np.random.default_rng(0)
    preds = {
        "atom_target": jnp.asarray(rng.normal(-4, 1, (2, G, G, 1)),
                                   jnp.float32),
        "atom_type": jnp.asarray(rng.normal(0, 1, (2, G, G, 14)),
                                 jnp.float32),
        "atom_charge": jnp.asarray(rng.normal(0, 1, (2, G, G, 3)),
                                   jnp.float32),
        "atom_hs": jnp.asarray(rng.normal(0, 1, (2, G, G, 2)), jnp.float32),
        "bond_target": jnp.asarray(rng.normal(-4, 1, (2, G, G, 1)),
                                   jnp.float32),
        "bond_type": jnp.asarray(rng.normal(0, 1, (2, G, G, 360)),
                                 jnp.float32),
        "bond_rho": jnp.asarray(rng.normal(0, 2, (2, G, G, 60)),
                                jnp.float32),
        "bond_omega": jnp.asarray(rng.normal(-4, 1, (2, G, G, 60)),
                                  jnp.float32),
    }
    peaks = extract_peaks(preds)
    assert peaks["atom_xy"].shape == (2, 128, 2)
    assert peaks["bond_delta"].shape == (2, 160 * 4, 2)
    assert peaks["bond_valid"].dtype == jnp.bool_
    # Random near-threshold noise: just require it runs and masks apply.
    assert bool(jnp.all(peaks["atom_score"] >= 0.0))


def test_assembly_pool_parity():
    """The persistent worker pool (make_assembly_pool / assemble_batch
    pool=) must return exactly the serial path's SMILES, in order."""
    import random

    import numpy as np

    from abcnet_tpu.data.generate import generate_sample
    from abcnet_tpu.infer.assemble import make_assembly_pool

    peaks_list, seed = [], 4200
    while len(peaks_list) < 5:
        s = generate_sample(random.Random(seed), mode="rdkit")
        seed += 1
        if s is None:
            continue
        atoms = parse_atoms_string(s.atoms_string)
        bonds = parse_bonds_string(s.bonds_string)
        peaks_list.append(extract_peaks(
            fake_logits_from_targets(encode_targets_np(atoms, bonds))))
    peaks = {k: np.concatenate([np.asarray(p[k]) for p in peaks_list])
             for k in peaks_list[0]}
    serial = assemble_batch(peaks)
    pool = make_assembly_pool(2)
    try:
        pooled = assemble_batch(peaks, pool=pool)
    finally:
        pool.close()
    assert pooled == serial
    assert sum(x is not None for x in serial) >= 4
