"""Cross-engine evaluation: train-on-A / eval-on-B generalization.

The reference's corpus spans two genuinely different drawing programs
(RDKit SVG, rdkit_img_generate.py:89-126; Indigo PNG,
indigo_img_generator.py:51-294), so its model generalizes across pixel
conventions. This framework's production weights were trained on
engine A only; this script measures the transfer gap by evaluating the
same held-out molecule stream rendered by BOTH engines at
reference-conditions settings (rdkit record lineage, 512 px canvas,
<= 28 heavy atoms — the refcond protocol of scripts/refcond_experiment.py).

For each engine the SAME molecules are rendered (same molecule RNG
stream, per-engine style RNG), so the exact-match delta isolates the
pixel-distribution shift from molecule difficulty.

Usage: python scripts/cross_engine_eval.py [n] [ckpt_dir]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.eval.scoring import score_pairs
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.infer.decode import make_infer_pipeline
from abcnet_tpu.train import trainer

EVAL_BATCH = 16
MAX_ATOMS = 28   # refcond heavy-atom cap (refcond_experiment.py:55)


def gen_paired_pools(seed: int, n: int):
    """Render the same molecule stream with both engines.

    Each attempt draws ONE molecule (via the molecule RNG) and renders
    it twice with engine-specific style RNGs; attempts where either
    engine rejects are skipped so both pools stay molecule-aligned."""
    from abcnet_tpu.chem import to_smiles
    from abcnet_tpu.chem.random_mol import random_molecule

    mol_rng = random.Random(seed)
    pools = {"a": [], "b": []}
    while len(pools["a"]) < n:
        # Draw ONE molecule, then render it with each engine under an
        # engine-specific style stream (corpus mode: smiles=...).
        mol = random_molecule(mol_rng, max_atoms=MAX_ATOMS)
        smi = to_smiles(mol, canonical=True)
        mseed = mol_rng.getrandbits(32)
        pair = {}
        for eng in ("a", "b"):
            r = random.Random(f"{mseed}-{eng}")
            s = generate_sample(r, mode="rdkit", smiles=smi, engine=eng)
            if s is None:
                break
            pair[eng] = s
        # GT must agree (depicted stereo can differ between layouts;
        # skip those so the two pools stay strictly comparable).
        if len(pair) == 2 and pair["a"].smiles == pair["b"].smiles:
            pools["a"].append(pair["a"])
            pools["b"].append(pair["b"])
    return pools


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "weights")
    n = (n // EVAL_BATCH) * EVAL_BATCH

    cfg = trainer.TrainConfig()
    state = trainer.create_state(cfg)
    state = trainer.restore_checkpoint(state, ckpt_dir)
    print(f"ckpt step {int(state.step)}", flush=True)

    print("generating paired pools...", flush=True)
    t0 = time.time()
    pools = gen_paired_pools(881001, n)
    print(f"pools ready ({time.time() - t0:.0f}s)", flush=True)

    run = make_infer_pipeline(state)
    scores = {}
    for eng, samples in pools.items():
        truths, preds = [], []
        t0 = time.time()
        for i in range(0, n, EVAL_BATCH):
            chunk = samples[i:i + EVAL_BATCH]
            peaks = run(np.stack([s.image for s in chunk]))
            preds.extend(assemble_batch(peaks))
            truths.extend(s.smiles for s in chunk)
        scores[eng] = score_pairs(truths, preds)
        print(f"E2E[engine-{eng}] {scores[eng]} "
              f"({time.time() - t0:.0f}s)", flush=True)
    print("CROSS-ENGINE TABLE (trained on engine A):", flush=True)
    for eng in ("a", "b"):
        print(f"  eval-on-{eng}: {scores[eng]}", flush=True)


if __name__ == "__main__":
    main()
