"""Round-2 from-scratch training run to the reference's data scale.

The round-1/2 checkpoints and generated corpora lived in gitignored
paths and were lost to a VM restart; this script rebuilds the whole
artifact chain from nothing, restart-safely:

  1. Generate a 90k-molecule mixed-lineage pool (reference scale,
     train.py:19-21: 90k train / held-out eval) from the seed-0 stream
     — the SAME stream as rounds 1-2, so the eval split (first 256
     accepted samples) stays comparable across rounds — and cache it
     to disk so watchdog relaunches load in seconds instead of
     regenerating for ~15 min.
  2. Train from scratch (or resume from weights/) with the reference's
     recipe (Adam 2.5e-4, wd 1e-8, batch 64, x0.1 LR drop at 1/3 of
     the budget — train.py:55,83-85 — plus a 1e-5 tail at 80%),
     scheduled against an ABSOLUTE wall-clock deadline passed in by
     the watchdog so kill-and-relaunch cannot reset the schedule.
  3. Checkpoint (full optimizer state) + run the eval meter suite
     every 2500 steps; on deadline, final eval + end-to-end decode of
     the held-out split to SMILES (img2smiles2.py role).

Usage:
  python scripts/train_r2_full.py <deadline_epoch_s> <total_hours> [pool_npz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.generate import Sample, generate_sample
from abcnet_tpu.eval.scoring import score_pairs, write_results_csv
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.infer.decode import make_infer_pipeline
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_N = 256
EVAL_BATCH = 16
POOL_N = 90000


def build_pool(path: str, n: int = POOL_N) -> None:
    """Generate n+EVAL_N samples (seed-0 stream) and cache to npz."""
    import random
    rng = random.Random(0)
    t0 = time.time()
    samples = []
    while len(samples) < n + EVAL_N:
        s = generate_sample(rng)
        if s is not None:
            samples.append(s)
            if len(samples) % 10000 == 0:
                print(f"gen {len(samples)}/{n + EVAL_N} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    # Variable canvas sizes (indigo lineage: 320-512): one flat uint8
    # blob + offsets/shapes. Uncompressed — load speed matters more
    # than the ~20 GB of disk here.
    blob = np.concatenate([s.image.ravel() for s in samples])
    shapes = np.array([s.image.shape for s in samples], np.int32)
    sizes = shapes.prod(axis=1)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    tmp = path + ".tmp.npz"
    np.savez(tmp,
             blob=blob, shapes=shapes, offsets=offsets,
             atoms=np.array([s.atoms_string for s in samples]),
             bonds=np.array([s.bonds_string for s in samples]),
             smiles=np.array([s.smiles for s in samples]))
    os.replace(tmp, path)
    print(f"pool cached: {len(samples)} samples, "
          f"{blob.nbytes / 1e9:.1f} GB, {time.time() - t0:.0f}s", flush=True)


def load_pool(path: str):
    t0 = time.time()
    z = np.load(path)
    # Bind each npz member ONCE — NpzFile.__getitem__ re-reads the whole
    # array from the zip on every access.
    blob, shapes, offsets = z["blob"], z["shapes"], z["offsets"]
    atoms, bonds, smiles = z["atoms"], z["bonds"], z["smiles"]
    samples = []
    for i in range(len(shapes)):
        h, w = shapes[i]
        img = blob[offsets[i]:offsets[i] + h * w].reshape(h, w)
        samples.append(Sample(image=img, atoms_string=str(atoms[i]),
                              bonds_string=str(bonds[i]),
                              smiles=str(smiles[i])))
    print(f"pool loaded: {len(samples)} samples in "
          f"{time.time() - t0:.0f}s", flush=True)
    return samples


def lr_for_fraction(f: float, base: float) -> float:
    """x0.1 drop at 1/3 of the budget (train.py:83-85 role, wall-clock
    axis), low tail at 80% for the final-metric polish."""
    if f < 1 / 3:
        return base
    if f < 0.8:
        return base * 0.1
    return 1e-5


def main():
    import random
    deadline = float(sys.argv[1])
    total_h = float(sys.argv[2])
    pool_path = sys.argv[3] if len(sys.argv) > 3 else \
        "/root/repo/data_cache/pool_90k.npz"
    batch = 64
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = os.path.join(repo, "weights")

    os.makedirs(os.path.dirname(pool_path), exist_ok=True)
    if not os.path.exists(pool_path):
        build_pool(pool_path)
    samples = load_pool(pool_path)
    eval_samples = samples[:EVAL_N]
    train_samples = samples[EVAL_N:]

    rng = random.Random(1)
    eval_examples = [pipeline.sample_to_example(s, rng, train=False)
                     for s in eval_samples]

    cfg = trainer.TrainConfig(batch_size=batch, lr=2.5e-4, amount=0.2,
                              log_every=100)
    mesh = make_mesh(1)
    state = trainer.create_state(cfg)
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        state = trainer.restore_checkpoint(state, ckpt_dir)
    start_step = int(state.step)
    print(f"start step {start_step}", flush=True)
    state = replicate_tree(state, mesh)

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
    step = start_step
    t0 = time.time()
    epoch = 0
    stop = False
    cur_lr = None
    while not stop:
        frac = 1.0 - max(deadline - time.time(), 0.0) / (total_h * 3600)
        order = np.random.default_rng(3000 + epoch).permutation(
            len(train_samples))
        for i in range(0, len(order) - batch + 1, batch):
            frac = 1.0 - max(deadline - time.time(), 0.0) / (total_h * 3600)
            lr = lr_for_fraction(frac, cfg.lr)
            if lr != cur_lr:
                state = trainer.set_learning_rate(state, lr)
                print(f"lr -> {lr} (budget fraction {frac:.2f})",
                      flush=True)
                cur_lr = lr
            examples = [pipeline.sample_to_example(
                train_samples[j], rng, train=True)
                for j in order[i:i + batch]]
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
                t0 = time.time()
            if time.time() > deadline:
                stop = True
                break
        epoch += 1

    trainer.save_checkpoint(state, ckpt_dir, step)
    key = run_eval(state, key)
    print(f"trained {step - start_step} steps this launch; "
          f"total {step * batch} images", flush=True)

    # ---- end-to-end decode on the held-out set ----
    run = make_infer_pipeline(state)
    truths, preds_all = [], []
    for i in range(0, EVAL_N, EVAL_BATCH):
        chunk = eval_samples[i:i + EVAL_BATCH]
        peaks = run(np.stack([s.image for s in chunk]))
        preds_all.extend(assemble_batch(peaks))
        truths.extend(s.smiles for s in chunk)
    write_results_csv("/tmp/train_r2_results.csv", truths, preds_all)
    print("FINAL", score_pairs(truths, preds_all), flush=True)


if __name__ == "__main__":
    main()
