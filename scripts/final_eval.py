"""Post-training evaluation: heatmap metric suite + end-to-end SMILES
accuracy, overall and split by render lineage.

The reference's retained baseline logs (train_meter, u1/u2) come from
its RDKit-only 512-canvas lineage; this framework trains the harder
mixed stream, so the per-lineage split is the like-for-like comparison
(REPORT_r2.md). Held-out molecules come from FRESH seed streams that
share no molecules with the 90k training pool.

Usage: python scripts/final_eval.py [n_per_mode] [ckpt_dir]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.eval.scoring import score_pairs, write_results_csv
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.infer.decode import make_infer_pipeline
from abcnet_tpu.parallel import make_mesh, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_BATCH = 16


def gen_pool(seed, n, mode):
    rng = random.Random(seed)
    out = []
    while len(out) < n:
        s = generate_sample(rng, mode=mode)
        if s is not None:
            out.append(s)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "weights")
    n = (n // EVAL_BATCH) * EVAL_BATCH

    cfg = trainer.TrainConfig()
    state = trainer.create_state(cfg)
    state = trainer.restore_checkpoint(state, ckpt_dir)
    step = int(state.step)
    print(f"ckpt step {step} ({step * 64 / 1e6:.2f}M images at batch 64)",
          flush=True)
    mesh = make_mesh(1)

    pools = {
        "rdkit": gen_pool(777001, n, "rdkit"),
        "indigo": gen_pool(777002, n, "indigo"),
    }

    key = jax.random.PRNGKey(123)
    rng = random.Random(9)
    for mode, samples in pools.items():
        examples = [pipeline.sample_to_example(s, rng, train=False)
                    for s in samples]
        em = MeterBank()
        for hb in pipeline.batches_from_examples(examples, EVAL_BATCH,
                                                 shuffle=False):
            key, sub = jax.random.split(key)
            _, _, mets = trainer.eval_step(state, shard_batch(hb, mesh),
                                           sub)
            em.update(mets)
        print(f"HEATMAP[{mode}] " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(em.averages().items())),
            flush=True)

    run = make_infer_pipeline(state)
    all_truths, all_preds = [], []
    all_preds_int = []
    for mode, samples in pools.items():
        truths, preds, preds_int = [], [], []
        t0 = time.time()
        for i in range(0, n, EVAL_BATCH):
            chunk = samples[i:i + EVAL_BATCH]
            peaks = run(np.stack([s.image for s in chunk]))
            preds.extend(assemble_batch(peaks))
            # A/B on the same peaks: reference integer-cell matching
            # (no sub-cell refinement) for the controlled comparison.
            preds_int.extend(assemble_batch(peaks, subcell=False))
            truths.extend(s.smiles for s in chunk)
        print(f"E2E[{mode}] {score_pairs(truths, preds)} "
              f"({time.time()-t0:.0f}s)", flush=True)
        print(f"E2E[{mode}/int-cell] {score_pairs(truths, preds_int)}",
              flush=True)
        all_truths.extend(truths)
        all_preds.extend(preds)
        all_preds_int.extend(preds_int)
    print(f"E2E[all] {score_pairs(all_truths, all_preds)}", flush=True)
    print(f"E2E[all/int-cell] {score_pairs(all_truths, all_preds_int)}",
          flush=True)
    out_csv = os.path.join(repo, "logs", f"final_eval_step{step}.csv")
    write_results_csv(out_csv, all_truths, all_preds)
    print(f"wrote {out_csv}", flush=True)


if __name__ == "__main__":
    main()
