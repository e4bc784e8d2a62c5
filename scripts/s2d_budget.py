"""Space-to-depth stem variant budget run (TPU-first flagship candidate).

models/unet_s2d.py replaces the 512-px/256-px encoder levels (never
consumed by the decoder, models/unet.py up-path) with a lossless
pixel-unshuffle stem at the 128-px grid -- the production step's HBM-
bandwidth + MXU-underutilization hot spot. Trains from scratch on the
SAME 90k pool, eval split and batch size as the production from-scratch
run so its EVAL lines are comparable at equal images-seen
(logs/train_r2_full.log), exactly like the round-3 CBAM protocol.

Checkpoints -> weights_s2d/.

Usage: python scripts/s2d_budget.py <deadline_epoch_s> [pool_npz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.pool import load_pool
from abcnet_tpu.eval.scoring import score_pairs
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.infer.decode import make_infer_pipeline
from abcnet_tpu.models.unet_s2d import UNetS2D
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_N = int(os.environ.get("FT_EVAL_N", 256))
EVAL_BATCH = 16
# 64 matches train_r2_full.py for images-seen parity; FT_BATCH is the
# CPU smoke override.
BATCH = int(os.environ.get("FT_BATCH", 64))


def main():
    import random
    deadline = float(sys.argv[1])
    pool_path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/data_cache/pool_90k.npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # argv[3]: checkpoint-dir override (CPU smoke drives must not leave
    # junk a real chip run would resume from).
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, "weights_s2d")

    samples = load_pool(pool_path)
    eval_samples = samples[:EVAL_N]
    train_samples = samples[EVAL_N:]

    rng = random.Random(1)
    eval_examples = [pipeline.sample_to_example(s, rng, train=False)
                     for s in eval_samples]

    cfg = trainer.TrainConfig(batch_size=BATCH, lr=2.5e-4, amount=0.2,
                              log_every=100)
    mesh = make_mesh(1)
    model = UNetS2D(dtype=jnp.bfloat16)
    state = trainer.create_state(cfg, model=model)
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        state = trainer.restore_checkpoint(state, ckpt_dir)
    start_step = int(state.step)
    print(f"S2D start step {start_step}", flush=True)
    state = replicate_tree(state, mesh)

    def run_eval(state, key):
        em = MeterBank()
        for hb in pipeline.batches_from_examples(
                eval_examples, EVAL_BATCH, shuffle=False):
            key, sub = jax.random.split(key)
            _, _, mets = trainer.eval_step(state, shard_batch(hb, mesh),
                                           sub)
            em.update(mets)
        print("S2D EVAL " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(em.averages().items())),
            flush=True)
        return key

    key = trainer.rng_key(43)
    meters = MeterBank()
    step = start_step
    t0 = time.time()
    epoch = 0
    stop = False
    while not stop:
        order = np.random.default_rng(5200 + epoch).permutation(
            len(train_samples))
        for i in range(0, len(order) - BATCH + 1, BATCH):
            examples = [pipeline.sample_to_example(
                train_samples[j], rng, train=True)
                for j in order[i:i + BATCH]]
            hb = pipeline.collate(examples)
            key, sub = jax.random.split(key)
            sb = shard_batch(hb, mesh)
            state, total, losses, _ = trainer.train_step(
                state, sb, sub, amount=cfg.amount, with_metrics=False)
            if step % 10 == 0:
                # Eval-mode forward on the same augmented batch (see
                # trainer.train_metrics_step; VERDICT r2 weak #5).
                meters.update(trainer.train_metrics_step(
                    state, sb, sub, amount=cfg.amount))
            step += 1
            if step % cfg.log_every == 0:
                avg = meters.averages()
                meters.reset()
                ips = cfg.log_every * BATCH / (time.time() - t0)
                t0 = time.time()
                print(f"S2D step {step} loss {float(total):.3f} "
                      f"ips {ips:.0f} "
                      f"aP {avg.get('atom_target_precision', 0):.3f} "
                      f"bP {avg.get('bond_target_precision', 0):.3f}",
                      flush=True)
            if step % 2000 == 0:
                trainer.save_checkpoint(state, ckpt_dir, step)
                key = run_eval(state, key)
                t0 = time.time()
            if time.time() > deadline:
                stop = True
                break
        epoch += 1

    trainer.save_checkpoint(state, ckpt_dir, step)
    key = run_eval(state, key)
    print(f"S2D trained {step - start_step} steps "
          f"({(step - start_step) * BATCH / 1e6:.2f}M images)", flush=True)

    run = make_infer_pipeline(state, sparse=False)
    truths, preds_all = [], []
    for i in range(0, EVAL_N, EVAL_BATCH):
        chunk = eval_samples[i:i + EVAL_BATCH]
        peaks = run(np.stack([s.image for s in chunk]))
        preds_all.extend(assemble_batch(peaks))
        truths.extend(s.smiles for s in chunk)
    print("S2D FINAL", score_pairs(truths, preds_all), flush=True)


if __name__ == "__main__":
    main()
