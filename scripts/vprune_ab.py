"""Valence-aware FP-bond prune A/B at adoption-grade n (round-5 gate).

The r5 probe (logs/atom_drop_probe_r5.log) attributed the overdeg
bucket — the states where the reference rewrites an atom's element to
fit an impossible valence (img2smiles2.py:247-271) — to false-positive
detected bonds, not endpoint theft. `VPRUNE_SCORE_MAX` drops the
lowest-confidence incident bond instead, gated on the bond's heatmap
score. It shipped default-off pending this A/B (REPORT_r5.md §2).

Runs the model ONCE per batch on the held-out per-lineage pools (same
seeds as scripts/final_eval.py so numbers are directly comparable),
then assembles the same peaks under a sweep of vprune gates. Adoption
rule: exact-match win on the combined pool with no per-lineage
regression.

Usage: python scripts/vprune_ab.py [n_per_mode] [ckpt_dir]
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.eval.scoring import score_pairs
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.infer.decode import make_infer_pipeline
from abcnet_tpu.train import trainer
from scripts.final_eval import gen_pool

EVAL_BATCH = 16
GATES = (0.0, 0.7, 0.75, 0.8, 0.85, 0.9)


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

    run = make_infer_pipeline(state)
    pools = {
        "rdkit": gen_pool(777001, n, "rdkit"),
        "indigo": gen_pool(777002, n, "indigo"),
    }

    truths = {m: [s.smiles for s in ss] for m, ss in pools.items()}
    preds = {g: {m: [] for m in pools} for g in GATES}
    for mode, samples in pools.items():
        for i in range(0, n, EVAL_BATCH):
            chunk = samples[i:i + EVAL_BATCH]
            peaks = run(np.stack([s.image for s in chunk]))
            for g in GATES:
                preds[g][mode].extend(
                    assemble_batch(peaks, vprune_score_max=g))

    for g in GATES:
        tag = "off" if g == 0.0 else f"{g:.2f}"
        both_t, both_p = [], []
        for mode in pools:
            print(f"VPRUNE[{tag}][{mode}] "
                  f"{score_pairs(truths[mode], preds[g][mode])}",
                  flush=True)
            both_t.extend(truths[mode])
            both_p.extend(preds[g][mode])
        print(f"VPRUNE[{tag}][all] {score_pairs(both_t, both_p)}",
              flush=True)


if __name__ == "__main__":
    main()
