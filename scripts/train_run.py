"""Full training run on the real chip: generate -> train -> decode -> score.

Usage: python scripts/train_run.py [n_samples] [epochs] [batch]
Writes checkpoints under weights/ and prints the eval suite + final
end-to-end SMILES accuracy on a held-out split.
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
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_N = 256
EVAL_BATCH = 16   # dense bond_type eval targets are big; keep small


def main():
    import random
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    ckpt_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights")

    rng = random.Random(0)
    t0 = time.time()
    samples = []
    while len(samples) < n + EVAL_N:
        s = generate_sample(rng)
        if s is not None:
            samples.append(s)
        if len(samples) % 4000 == 0:
            print(f"gen {len(samples)}/{n + EVAL_N} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    eval_samples = samples[:EVAL_N]
    train_samples = samples[EVAL_N:]
    print(f"generated {len(samples)} in {time.time()-t0:.0f}s", flush=True)

    # Eval examples: fixed, no augmentation.
    eval_examples = [pipeline.sample_to_example(s, rng, train=False)
                     for s in eval_samples]

    cfg = trainer.TrainConfig(batch_size=batch, epochs=epochs,
                              amount=0.2, log_every=100)
    mesh = make_mesh(1)
    state = replicate_tree(trainer.create_state(cfg), mesh)

    key = jax.random.PRNGKey(1)
    meters = MeterBank()
    step = 0
    t0 = time.time()
    for epoch in range(cfg.epochs):
        if epoch == cfg.lr_drop_epoch:
            state = trainer.set_learning_rate(state, cfg.lr * 0.1)
            print(f"lr -> {cfg.lr * 0.1}", flush=True)
        # Fresh augmentation each epoch (the reference's dataloader
        # re-runs __getitem__ per epoch).
        order = np.random.default_rng(epoch).permutation(len(train_samples))
        for i in range(0, len(order) - batch + 1, batch):
            examples = [pipeline.sample_to_example(
                train_samples[j], rng, train=True)
                for j in order[i:i + batch]]
            hb = pipeline.collate(examples)
            key, sub = jax.random.split(key)
            state, total, losses, mets = trainer.train_step(
                state, shard_batch(hb, mesh), sub, amount=cfg.amount)
            meters.update(mets)
            step += 1
            if step % cfg.log_every == 0:
                avg = meters.averages()
                meters.reset()
                ips = cfg.log_every * batch / (time.time() - t0)
                t0 = time.time()
                print(f"ep {epoch} step {step} loss {float(total):.3f} "
                      f"ips {ips:.0f} "
                      f"aP {avg['atom_target_precision']:.3f} "
                      f"aR {avg['atom_target_recall']:.3f} "
                      f"bP {avg['bond_target_precision']:.3f} "
                      f"bR {avg['bond_target_recall']:.3f} "
                      f"oP {avg['bond_omega_precision']:.3f} "
                      f"rho {avg['bond_rhos_mae']:.3f} "
                      f"tA {avg['atom_types_acc']:.4f}", flush=True)
        if (epoch + 1) % 5 == 0 or epoch == cfg.epochs - 1:
            trainer.save_checkpoint(state, ckpt_dir, int(state.step))
            print(f"ckpt @ step {int(state.step)}", flush=True)
        if (epoch + 1) % 4 == 0:
            em = MeterBank()
            for hb in pipeline.batches_from_examples(
                    eval_examples, EVAL_BATCH, shuffle=False):
                key, sub = jax.random.split(key)
                _, _, mets = trainer.eval_step(state,
                                               shard_batch(hb, mesh), sub)
                em.update(mets)
            avg = em.averages()
            print("EVAL " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(avg.items())), flush=True)

    # ---- end-to-end decode on the held-out set ----
    from abcnet_tpu.infer.decode import make_infer_pipeline
    run = make_infer_pipeline(state)

    truths, preds_all = [], []
    for i in range(0, EVAL_N - EVAL_BATCH + 1, EVAL_BATCH):
        chunk = eval_samples[i:i + EVAL_BATCH]
        peaks = run(np.stack([s.image for s in chunk]))
        preds_all.extend(assemble_batch(peaks))
        truths.extend(s.smiles for s in chunk)
    write_results_csv("/tmp/train_run_results.csv", truths, preds_all)
    print("FINAL", score_pairs(truths, preds_all), flush=True)


if __name__ == "__main__":
    main()
