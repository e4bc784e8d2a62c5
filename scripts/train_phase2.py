"""Phase-2 training: widen the data (54k unique molecules), resume from
the phase-1 checkpoint, finish with end-to-end scoring.

Usage: python scripts/train_phase2.py [extra_data_dir] [epochs] [lr]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
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
    extra_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/data_extra"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
    batch = 64
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = os.path.join(repo, "weights")

    # Recreate the phase-1 stream: eval split = first 256 of seed 0.
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
    extra = pipeline.load_csv_dataset(os.path.join(extra_dir,
                                                   "dataset.csv"))
    train_samples.extend(extra)
    print(f"train pool: {len(train_samples)} molecules", flush=True)

    eval_examples = [pipeline.sample_to_example(s, rng, train=False)
                     for s in eval_samples]

    cfg = trainer.TrainConfig(batch_size=batch, epochs=epochs, lr=lr,
                              amount=0.2, log_every=100)
    mesh = make_mesh(1)
    state = trainer.create_state(cfg)
    state = trainer.restore_checkpoint(state, ckpt_dir)
    print(f"resumed from step {int(state.step)}", flush=True)
    state = replicate_tree(state, mesh)
    state = trainer.set_learning_rate(state, lr)

    key = jax.random.PRNGKey(7)
    meters = MeterBank()
    step = 0
    t0 = time.time()
    for epoch in range(epochs):
        if epoch == int(epochs * 2 / 3):
            state = trainer.set_learning_rate(state, lr * 0.25)
            print(f"lr -> {lr * 0.25}", flush=True)
        order = np.random.default_rng(1000 + epoch).permutation(
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
                print(f"ep {epoch} step {int(state.step)} "
                      f"loss {float(total):.3f} ips {ips:.0f} "
                      f"aP {avg['atom_target_precision']:.3f} "
                      f"bP {avg['bond_target_precision']:.3f} "
                      f"oP {avg['bond_omega_precision']:.3f} "
                      f"rho {avg['bond_rhos_mae']:.3f}", flush=True)
        if (epoch + 1) % 3 == 0 or epoch == epochs - 1:
            trainer.save_checkpoint(state, ckpt_dir, int(state.step))
            em = MeterBank()
            for hb in pipeline.batches_from_examples(
                    eval_examples, EVAL_BATCH, shuffle=False):
                key, sub = jax.random.split(key)
                _, _, mets = trainer.eval_step(state,
                                               shard_batch(hb, mesh), sub)
                em.update(mets)
            print("EVAL " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(em.averages().items())),
                flush=True)

    run = make_infer_pipeline(state)
    truths, preds_all = [], []
    for i in range(0, EVAL_N - EVAL_BATCH + 1, EVAL_BATCH):
        chunk = eval_samples[i:i + EVAL_BATCH]
        peaks = run(np.stack([s.image for s in chunk]))
        preds_all.extend(assemble_batch(peaks))
        truths.extend(s.smiles for s in chunk)
    write_results_csv("/tmp/train_phase2_results.csv", truths, preds_all)
    print("FINAL", score_pairs(truths, preds_all), flush=True)


if __name__ == "__main__":
    main()
