"""Phase-3 training (round 2): resume from the phase-2 checkpoint and
train to / beyond the reference's total data scale (90k molecules x 30
epochs = 2.7M images, train.py:19-21), then record the final heatmap
metric suite and end-to-end SMILES accuracy.

Usage:
  python scripts/train_phase3.py [max_hours] [lr] [extra_dirs...]

The eval split is the SAME 256 molecules as phases 1-2 (first 256 of
the seed-0 generation stream) so numbers are comparable across phases.
Stops cleanly on the wall-clock budget, checkpointing as it goes (the
axon tunnel can drop; long runs must checkpoint regularly).
"""

import os
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
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_N = 256
EVAL_BATCH = 16


def main():
    import random
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 4.5
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 5e-5
    extra_dirs = sys.argv[3:] or ["/root/data_extra", "/root/data_extra2"]
    batch = 64
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = os.path.join(repo, "weights")

    # Phase-1 stream: eval split = first 256 of seed 0 (fixed across
    # phases for comparability).
    rng = random.Random(0)
    t0 = time.time()
    samples = []
    while len(samples) < 24000 + EVAL_N:
        s = generate_sample(rng)
        if s is not None:
            samples.append(s)
    eval_samples = samples[:EVAL_N]
    train_samples = samples[EVAL_N:]
    print(f"regenerated phase-1 stream in {time.time()-t0:.0f}s",
          flush=True)
    for d in extra_dirs:
        csv = os.path.join(d, "dataset.csv")
        if os.path.exists(csv):
            extra = pipeline.load_csv_dataset(csv)
            train_samples.extend(extra)
            print(f"+{len(extra)} from {d}", flush=True)
    print(f"train pool: {len(train_samples)} molecules", flush=True)

    eval_examples = [pipeline.sample_to_example(s, rng, train=False)
                     for s in eval_samples]

    cfg = trainer.TrainConfig(batch_size=batch, lr=lr, amount=0.2,
                              log_every=100)
    mesh = make_mesh(1)
    state = trainer.create_state(cfg)
    state = trainer.restore_checkpoint(state, ckpt_dir)
    start_step = int(state.step)
    print(f"resumed from step {start_step}", flush=True)
    state = replicate_tree(state, mesh)
    state = trainer.set_learning_rate(state, lr)

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

    key = jax.random.PRNGKey(11)
    meters = MeterBank()
    deadline = time.time() + max_hours * 3600
    dropped = False
    step = start_step
    t0 = time.time()
    epoch = 0
    stop = False
    while not stop:
        # LR drop at 60% of the wall-clock budget (epoch-agnostic: the
        # budget, not the epoch count, is the schedule axis here).
        if not dropped and time.time() > deadline - 0.4 * max_hours * 3600:
            state = trainer.set_learning_rate(state, lr * 0.2)
            print(f"lr -> {lr * 0.2}", flush=True)
            dropped = True
        order = np.random.default_rng(3000 + epoch).permutation(
            len(train_samples))
        for i in range(0, len(order) - batch + 1, batch):
            examples = [pipeline.sample_to_example(
                train_samples[j], rng, train=True)
                for j in order[i:i + batch]]
            hb = pipeline.collate(examples)
            key, sub = jax.random.split(key)
            with_m = step % 5 == 0
            state, total, losses, mets = trainer.train_step(
                state, shard_batch(hb, mesh), sub, amount=cfg.amount,
                with_metrics=with_m)
            if with_m:
                meters.update(mets)
            step += 1
            if step % cfg.log_every == 0:
                avg = meters.averages()
                meters.reset()
                ips = cfg.log_every * batch / (time.time() - t0)
                t0 = time.time()
                print(f"ep {epoch} step {step} "
                      f"loss {float(total):.3f} ips {ips:.0f} "
                      f"aP {avg.get('atom_target_precision', 0):.3f} "
                      f"bP {avg.get('bond_target_precision', 0):.3f} "
                      f"oP {avg.get('bond_omega_precision', 0):.3f} "
                      f"rho {avg.get('bond_rhos_mae', 0):.3f}",
                      flush=True)
            if step % 2500 == 0:
                trainer.save_checkpoint(state, ckpt_dir, step)
                key = run_eval(state, key)
            if time.time() > deadline:
                stop = True
                break
        epoch += 1

    trainer.save_checkpoint(state, ckpt_dir, step)
    key = run_eval(state, key)
    print(f"trained {step - start_step} steps "
          f"({(step - start_step) * batch} images); total {step * batch}",
          flush=True)

    # ---- end-to-end decode on the held-out set ----
    run = make_infer_pipeline(state)
    truths, preds_all = [], []
    for i in range(0, EVAL_N, EVAL_BATCH):
        chunk = eval_samples[i:i + EVAL_BATCH]
        peaks = run(np.stack([s.image for s in chunk]))
        preds_all.extend(assemble_batch(peaks))
        truths.extend(s.smiles for s in chunk)
    write_results_csv("/tmp/train_phase3_results.csv", truths, preds_all)
    print("FINAL", score_pairs(truths, preds_all), flush=True)


if __name__ == "__main__":
    main()
