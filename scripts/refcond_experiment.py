"""Reference-conditions controlled experiment (round-3 verdict #1).

The reference's retained baselines (src/train_meter:86-102, atom
precision 0.9729) come from training on renders of REAL drug-like
ChEMBL molecules, RDKit-lineage only, at full 512-pixel canvases
(rdkit_img_generate.py:221, src/train.py:19-21). This framework trains
a deliberately harder stream (random molecules up to 40 heavy atoms,
mixed rdkit/indigo lineages, 320-512 canvases) and round 2 could only
*conjecture* that the 0.895-vs-0.973 precision gap is data difficulty.

This script turns the conjecture into a measurement:

  1. builds a "reference-conditions" pool — rdkit lineage only, full
     512 canvases, heavy-atom count capped at 28 (ChEMBL drug-like
     mean ~27) — 20k train + 256 eval, disk-cached;
  2. REFCOND-BASE: evaluates the production checkpoint on the refcond
     eval split (heatmap metric suite + end-to-end SMILES) with NO
     training — the pure data-difficulty decomposition;
  3. REFCOND-FT: fine-tunes on the refcond train split at low LR
     (budgeted by an absolute deadline), then re-evaluates. This is
     the number to hold against the reference's 0.9729 / its ~0.97
     end-to-end claim, trained and evaluated under matched conditions.

Checkpoints go to weights_refcond/ (the production lineage in weights/
is untouched). Watchdog-relaunch safe: resumes from weights_refcond
when present.

Usage: python scripts/refcond_experiment.py <deadline_epoch_s> [pool]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.data.pool import ensure_pool
from abcnet_tpu.eval.scoring import score_pairs, write_results_csv
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.infer.decode import make_infer_pipeline
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_N = 256
EVAL_BATCH = 16
TRAIN_N = 20000
BATCH = 128
LR = 2.5e-5
MAX_ATOMS = 28        # ChEMBL drug-like heavy-atom cap


def refcond_sample(rng):
    return generate_sample(rng, mode="rdkit", max_atoms=MAX_ATOMS)


def main():
    import random
    deadline = float(sys.argv[1])
    pool_path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/data_cache/pool_refcond.npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prod_ckpt = os.path.join(repo, "weights")
    ft_ckpt = os.path.join(repo, "weights_refcond")

    samples = ensure_pool(pool_path, TRAIN_N + EVAL_N, refcond_sample,
                          seed=500)
    eval_samples = samples[:EVAL_N]
    train_samples = samples[EVAL_N:]

    rng = random.Random(1)
    eval_examples = [pipeline.sample_to_example(s, rng, train=False)
                     for s in eval_samples]

    cfg = trainer.TrainConfig(batch_size=BATCH, lr=LR, amount=0.2,
                              log_every=50)
    mesh = make_mesh(1)
    state = trainer.create_state(cfg)
    resumed = os.path.isdir(ft_ckpt) and os.listdir(ft_ckpt)
    state = trainer.restore_checkpoint(
        state, ft_ckpt if resumed else prod_ckpt)
    start_step = int(state.step)
    print(f"start step {start_step} (resumed={bool(resumed)})", flush=True)
    state = replicate_tree(state, mesh)
    state = trainer.set_learning_rate(state, LR)

    def run_eval(state, key, tag):
        em = MeterBank()
        for hb in pipeline.batches_from_examples(
                eval_examples, EVAL_BATCH, shuffle=False):
            key, sub = jax.random.split(key)
            _, _, mets = trainer.eval_step(state, shard_batch(hb, mesh),
                                           sub)
            em.update(mets)
        print(f"{tag} EVAL " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(em.averages().items())),
            flush=True)
        return key

    def run_e2e(state, tag, csv=None):
        run = make_infer_pipeline(state)
        truths, preds = [], []
        for i in range(0, EVAL_N, EVAL_BATCH):
            chunk = eval_samples[i:i + EVAL_BATCH]
            peaks = run(np.stack([s.image for s in chunk]))
            preds.extend(assemble_batch(peaks))
            truths.extend(s.smiles for s in chunk)
        print(f"{tag} E2E {score_pairs(truths, preds)}", flush=True)
        if csv:
            write_results_csv(csv, truths, preds)

    key = trainer.rng_key(31)
    if not resumed:
        # ---- stage 2: zero-shot data-difficulty decomposition ----
        key = run_eval(state, key, "REFCOND-BASE")
        run_e2e(state, "REFCOND-BASE")

    # ---- stage 3: fine-tune under reference conditions ----
    meters = MeterBank()
    step = start_step
    t0 = time.time()
    draw = np.random.default_rng(6000 + start_step)
    while time.time() < deadline:
        batch_idx = draw.integers(0, len(train_samples), BATCH)
        examples = [pipeline.sample_to_example(
            train_samples[j], rng, train=True) for j in batch_idx]
        hb = pipeline.collate(examples)
        key, sub = jax.random.split(key)
        sb = shard_batch(hb, mesh)
        state, total, losses, _ = trainer.train_step(
            state, sb, sub, amount=cfg.amount, with_metrics=False)
        if step % 10 == 0:
            # Eval-mode forward on the same augmented batch: train-mode
            # BN/dropout starve the 0.25 peak threshold and quantize
            # precision to n/tiny-count (VERDICT r2 weak #5).
            meters.update(trainer.train_metrics_step(
                state, sb, sub, amount=cfg.amount))
        step += 1
        if step % cfg.log_every == 0:
            avg = meters.averages()
            meters.reset()
            ips = cfg.log_every * BATCH / (time.time() - t0)
            t0 = time.time()
            print(f"step {step} loss {float(total):.3f} ips {ips:.0f} "
                  f"aP {avg.get('atom_target_precision', 0):.3f} "
                  f"bP {avg.get('bond_target_precision', 0):.3f}",
                  flush=True)
        if step % 1000 == 0:
            trainer.save_checkpoint(state, ft_ckpt, step)
            key = run_eval(state, key, "REFCOND-FT")
            t0 = time.time()

    trainer.save_checkpoint(state, ft_ckpt, step)
    key = run_eval(state, key, "REFCOND-FT")
    run_e2e(state, "REFCOND-FT",
            os.path.join(repo, "logs", "refcond_results.csv"))
    print(f"FINAL refcond fine-tune: {step - start_step} steps "
          f"({(step - start_step) * BATCH / 1e6:.2f}M images)", flush=True)


if __name__ == "__main__":
    main()
