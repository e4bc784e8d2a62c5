"""Production-lineage low-LR fine-tune with hard-example mining.

Round-2 left exact-cell atom precision at 0.895 (reference logs: 0.973)
with 69/96 end-to-end misses classified "struct" — heatmap errors on
crowded drawings (logs/classify_r2.log). This continues the production
checkpoint (weights/, step 56000+) with the two training levers the
round-3 verdict names:

  1. longer low-LR fine-tune (2.5e-5, 1e-5 tail at 85% of budget);
  2. hard-example mining: one end-to-end decode sweep over the 90k
     training pool marks the molecules the current model gets wrong;
     fine-tune batches oversample them (HARD_FRAC of each batch).

Mining indices are cached per checkpoint step so watchdog relaunches
(the axon tunnel can hang mid-run) skip the ~10-minute sweep.

Batch 128 (bench.py --train-batch 128: 172 vs 147 img/s at 64).

Usage: python scripts/finetune_hard.py <deadline_epoch_s> [pool_npz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from abcnet_tpu.chem import canonical_smiles
from abcnet_tpu.data import pipeline
from abcnet_tpu.data.pool import load_pool
from abcnet_tpu.eval.scoring import score_pairs
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.infer.decode import make_infer_pipeline
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_N = 256          # same held-out split as train_r2_full.py
EVAL_BATCH = 16
BATCH = 128
LR = 2.5e-5
HARD_FRAC = 0.3       # fraction of each batch drawn from the mined set
MINE_BATCH = 64


def _same_mol(pred, truth):
    """Canonical-form-insensitive equality: the pool stores aromatic-form
    SMILES while the assembler emits kekulized form, so a raw string
    compare marks ~every aromatic molecule wrong (measured on
    logs/final_eval_step56000.csv: 298 of 394 raw mismatches are
    form-only). Short-circuit on raw equality, else canonicalize both."""
    if pred is None:
        return False
    if pred == truth:
        return True
    try:
        return canonical_smiles(pred) == canonical_smiles(truth)
    except Exception:
        return False


def mine_hard(state, samples, cache_path):
    """One decode sweep over the training split; returns indices of
    molecules whose canonical SMILES the current model misses."""
    if os.path.exists(cache_path):
        idx = np.load(cache_path)
        print(f"mined cache: {len(idx)} hard examples", flush=True)
        return idx
    run = make_infer_pipeline(state)
    wrong = []
    t0 = time.time()
    n = len(samples)
    for i in range(0, n - MINE_BATCH + 1, MINE_BATCH):
        chunk = samples[i:i + MINE_BATCH]
        # Eval-mode preprocessing (no noise): mining should reflect the
        # model's clean-image failures, matching the eval metric. Pool
        # images are already center-padded to the full 512 canvas.
        peaks = run(np.stack([s.image for s in chunk]))
        preds = assemble_batch(peaks)
        for j, (s, p) in enumerate(zip(chunk, preds)):
            if not _same_mol(p, s.smiles):
                wrong.append(i + j)
        if (i // MINE_BATCH) % 100 == 99:
            print(f"mine {i + MINE_BATCH}/{n} wrong={len(wrong)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    idx = np.asarray(wrong, np.int64)
    np.save(cache_path, idx)
    print(f"mined {len(idx)}/{n} hard examples "
          f"({time.time() - t0:.0f}s)", flush=True)
    return idx


def main():
    import random
    deadline = float(sys.argv[1])
    pool_path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/data_cache/pool_90k.npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = os.path.join(repo, "weights")

    samples = load_pool(pool_path)
    eval_samples = samples[:EVAL_N]
    train_samples = samples[EVAL_N:]

    rng = random.Random(1)
    eval_examples = [pipeline.sample_to_example(s, rng, train=False)
                     for s in eval_samples]

    cfg = trainer.TrainConfig(batch_size=BATCH, lr=LR, amount=0.2,
                              log_every=50)
    mesh = make_mesh(1)
    state = trainer.create_state(cfg)
    state = trainer.restore_checkpoint(state, ckpt_dir)
    start_step = int(state.step)
    print(f"start step {start_step}", flush=True)

    # Mining cache: any prior sweep's indices are good enough after a
    # watchdog relaunch (the hard set drifts slowly); mine fresh only
    # when none exists.
    import glob
    import re
    # Numeric sort: lexicographic order would let hard_idx_56000 shadow
    # hard_idx_100000 forever once the step count gains a digit.
    prior = sorted(
        glob.glob(os.path.join(repo, "data_cache", "hard_idx_*.npy")),
        key=lambda p: int(re.search(r"hard_idx_(\d+)", p).group(1)))
    cache = prior[-1] if prior else os.path.join(
        repo, "data_cache", f"hard_idx_{start_step}.npy")
    hard_idx = mine_hard(state, train_samples, cache)
    hard_set = np.asarray(hard_idx)

    state = replicate_tree(state, mesh)
    state = trainer.set_learning_rate(state, LR)

    def run_eval(state, key):
        em = MeterBank()
        for hb in pipeline.batches_from_examples(
                eval_examples, EVAL_BATCH, shuffle=False):
            key, sub = jax.random.split(key)
            _, _, mets = trainer.eval_step(state, shard_batch(hb, mesh),
                                           sub)
            em.update(mets)
        print("EVAL " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(em.averages().items())),
            flush=True)
        return key

    key = trainer.rng_key(21)
    meters = MeterBank()
    step = start_step
    t0 = time.time()
    draw = np.random.default_rng(4000 + start_step)
    n_hard = max(1, int(BATCH * HARD_FRAC))
    cur_lr = LR
    total_budget = max(deadline - time.time(), 1.0)
    while time.time() < deadline:
        frac = 1.0 - max(deadline - time.time(), 0.0) / total_budget
        lr = LR if frac < 0.85 else 1e-5
        if lr != cur_lr:
            state = trainer.set_learning_rate(state, lr)
            print(f"lr -> {lr}", flush=True)
            cur_lr = lr
        if len(hard_set):
            hard = draw.choice(hard_set, n_hard)
            rest = draw.integers(0, len(train_samples), BATCH - n_hard)
            batch_idx = np.concatenate([hard, rest])
        else:
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
                  f"bP {avg.get('bond_target_precision', 0):.3f} "
                  f"oP {avg.get('bond_omega_precision', 0):.3f}",
                  flush=True)
        if step % 1000 == 0:
            trainer.save_checkpoint(state, ckpt_dir, step)
            key = run_eval(state, key)
            t0 = time.time()

    trainer.save_checkpoint(state, ckpt_dir, step)
    key = run_eval(state, key)
    print(f"fine-tuned {step - start_step} steps "
          f"({(step - start_step) * BATCH / 1e6:.2f}M images)", flush=True)

    run = make_infer_pipeline(state)
    truths, preds_all = [], []
    for i in range(0, EVAL_N, EVAL_BATCH):
        chunk = eval_samples[i:i + EVAL_BATCH]
        peaks = run(np.stack([s.image for s in chunk]))
        preds_all.extend(assemble_batch(peaks))
        truths.extend(s.smiles for s in chunk)
    print("FINAL", score_pairs(truths, preds_all), flush=True)


if __name__ == "__main__":
    main()
