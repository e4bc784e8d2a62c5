"""Round-5 production training run (VERDICT r4 next-round #1/#3/#5).

Differences from the round-2..4 recipe (scripts/train_r2_full.py),
each driven by a VERDICT r4 item:

  #1  DISASTER INSURANCE: after every 2500-step orbax checkpoint a
      float16 snapshot (scripts/snapshot_weights.py, ~21 MB) is
      written to snapshots/r5_latest.npz and periodically COMMITTED
      TO GIT from a CPU-only subprocess — the r3 and r4 checkpoints
      both died with VM rebuilds because weights lived only on
      scratch disk.
  #3  degrade_p=0.10 scan-style degradation (blur/erode/downscale/
      JPEG, data/degrade.py) baked into main training instead of a
      separate fine-tune; the pool itself carries 15% engine-B
      pixels (scripts/build_pool_r5.py) for cross-engine transfer.
  #5  indigo-lineage fraction 0.6 in the pool + recalibrated
      atom-type focal weights (C/N/O 0.1 -> 0.3; see
      ops/losses.set_atom_type_weights) against the r4 elem-swap
      failure bucket.

Everything else is reference parity: Adam 2.5e-4, wd 1e-8, batch 64,
x0.1 LR drop at 1/3 of the budget (train.py:55,83-85), 1e-5 tail at
80%, per-checkpoint eval on the frozen 256-sample split.

Usage:
  python scripts/train_r5.py <deadline_epoch_s> <total_hours> [pool_npz]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.pool import load_pool
from abcnet_tpu.ops import losses
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_N = int(os.environ.get("R5_EVAL_N", 256))   # env: CPU smoke tests
EVAL_BATCH = 16
DEGRADE_P = float(os.environ.get("R5_DEGRADE_P", 0.10))
# r4 failure taxonomy: raise the C/N/O true-class weight so the model
# commits to the majority elements (C->P / N->P / N->S swaps).
ATOM_W_R5 = (1, 0.3, 0.3, 0.3, 1, 1, 1, 1, 1, 10, 10, 10, 10, 10)
SNAPSHOT_COMMIT_EVERY = 10000   # steps between git commits of the snapshot

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def snapshot_and_maybe_commit(ckpt_dir: str, step: int, commit: bool) -> None:
    """Write snapshots/r5_latest.npz from the latest orbax checkpoint in
    a CPU-only subprocess (never touches the live TPU client), then
    optionally commit it. Failures are logged, never fatal — the
    training loop must not die because git or the snapshot hiccuped."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import os; os.chdir(%r); "
        "from scripts.snapshot_weights import save; "
        "p = save(%r, 'r5'); "
        "os.replace(p, os.path.join(%r, 'snapshots', 'r5_latest.npz'))"
        % (REPO, REPO, ckpt_dir, REPO))
    try:
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       timeout=600)
    except Exception as e:  # noqa: BLE001
        print(f"[snapshot] FAILED at step {step}: {e}", flush=True)
        return
    if not commit:
        return
    for attempt in range(3):
        try:
            subprocess.run(["git", "-C", REPO, "add",
                            "snapshots/r5_latest.npz"], check=True,
                           timeout=60)
            r = subprocess.run(
                ["git", "-C", REPO, "commit",
                 "-m", f"r5 training snapshot at step {step}",
                 "--", "snapshots/r5_latest.npz"],
                capture_output=True, text=True, timeout=60)
            print(f"[snapshot] commit step {step}: rc={r.returncode} "
                  f"{(r.stdout or r.stderr).strip().splitlines()[:1]}",
                  flush=True)
            return
        except Exception as e:  # noqa: BLE001
            print(f"[snapshot] git attempt {attempt}: {e}", flush=True)
            time.sleep(5)


def lr_for_fraction(f: float, base: float) -> float:
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
        "/root/repo/data_cache/pool_r5.npz"
    batch = int(os.environ.get("R5_BATCH", 64))
    ckpt_dir = os.path.join(REPO, "weights")

    losses.set_atom_type_weights(ATOM_W_R5)
    print(f"atom weights {ATOM_W_R5}, degrade_p {DEGRADE_P}", flush=True)

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

    key = trainer.rng_key(11)
    meters = MeterBank()
    step = start_step
    t0 = time.time()
    epoch = 0
    stop = False
    cur_lr = None
    last_commit_step = start_step
    while not stop:
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
                train_samples[j], rng, train=True, degrade_p=DEGRADE_P)
                for j in order[i:i + batch]]
            hb = pipeline.collate(examples)
            key, sub = jax.random.split(key)
            sb = shard_batch(hb, mesh)
            state, total, losses_d, _ = trainer.train_step(
                state, sb, sub, amount=cfg.amount, with_metrics=False)
            if step % 10 == 0:
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
                commit = step - last_commit_step >= SNAPSHOT_COMMIT_EVERY
                if commit:
                    last_commit_step = step
                snapshot_and_maybe_commit(ckpt_dir, step, commit)
                key = run_eval(state, key)
                t0 = time.time()
            if time.time() > deadline:
                stop = True
                break
        epoch += 1

    trainer.save_checkpoint(state, ckpt_dir, step)
    snapshot_and_maybe_commit(ckpt_dir, step, commit=True)
    key = run_eval(state, key)
    print(f"trained {step - start_step} steps this launch; "
          f"total {step * batch} images", flush=True)
    print("RUN COMPLETE", flush=True)


if __name__ == "__main__":
    main()
