"""Robustness fine-tune: degradation augmentation + engine-B pixels.

Two round-4 capabilities in one continued-training run on the
production checkpoint:

  1. DEGRADATION ROBUSTNESS (the scanned-domain stand-in): train-time
     blur/erode/downscale/JPEG at rate DEGRADE_P (data/degrade.py) —
     the reference trains salt/pepper-only (src/utils.py:73-80) but
     evaluates on real scans (img2smiles2.py:36); clean-trained weights
     collapse on blur_r2/erode (0.055/0.031 exact,
     logs/degraded_bench_r2.log).
  2. CROSS-ENGINE pixels: a fraction B_FRAC of each batch renders with
     engine B (data/render2.py), the two-renderer corpus diversity the
     reference gets from RDKit-SVG + Indigo-PNG.

Checkpoints go to weights_robust/ — the production weights/ stay
untouched until the degraded + clean + cross-engine evals justify
promotion.

Usage: python scripts/finetune_robust.py <deadline_epoch_s> [pool_npz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.pool import ensure_pool, load_pool
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer
from abcnet_tpu.train.metrics import MeterBank

EVAL_N = int(os.environ.get("FT_EVAL_N", 256))  # held-out split as in
EVAL_BATCH = 16                                 # train_r2_full.py
BATCH = int(os.environ.get("FT_BATCH", 128))
# Env overrides exist for the CPU insurance drive (tiny image budget →
# concentrate the new-domain signal); the chip chain uses the defaults.
LR = float(os.environ.get("FT_LR", 2.5e-5))
DEGRADE_P = float(os.environ.get("FT_DEGRADE_P", 0.40))
B_FRAC = float(os.environ.get("FT_B_FRAC", 0.15))
# Hard-tail degradation regime (blur/erode biased, partial erosion) —
# the r5 main run already trains degrade_p=0.10 on the DEFAULT regime
# and still collapses on blur_r2/erode (logs/degraded_r5d.log), so the
# fine-tune targets the measured tail. FT_HARD=0 restores the r4 form.
HARD = os.environ.get("FT_HARD", "1") != "0"
B_POOL_N = int(os.environ.get("FT_B_POOL_N", 24000))


def _gen_b(rng):
    from abcnet_tpu.data.generate import generate_sample
    return generate_sample(rng, mode="mixed", engine="b")


def main():
    import random
    deadline = float(sys.argv[1])
    pool_path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/data_cache/pool_r5.npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src_ckpt = os.path.join(repo, "weights")
    # argv[3]/argv[4]: engine-B pool and output checkpoint dir overrides
    # (used by the CPU smoke drive so it can't pollute the real run).
    out_ckpt = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        repo, "weights_robust")

    b_pool_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, "data_cache", f"pool_b_{B_POOL_N // 1000}k.npz")
    b_pool_n = B_POOL_N if len(sys.argv) <= 3 else 64
    b_samples = ensure_pool(b_pool_path, b_pool_n, sample_fn=_gen_b,
                            seed=31)

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
    # Resume from weights_robust when this run was watchdog-relaunched;
    # otherwise continue the production checkpoint.
    resume = os.path.isdir(out_ckpt) and os.listdir(out_ckpt)
    state = trainer.restore_checkpoint(state,
                                       out_ckpt if resume else src_ckpt)
    start_step = int(state.step)
    print(f"start step {start_step} (resume={bool(resume)}) "
          f"degrade_p={DEGRADE_P} hard={HARD} b_frac={B_FRAC} lr={LR}",
          flush=True)

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

    key = trainer.rng_key(37)
    meters = MeterBank()
    step = start_step
    t0 = time.time()
    draw = np.random.default_rng(5000 + start_step)
    n_b = max(1, int(BATCH * B_FRAC))
    cur_lr = LR
    total_budget = max(deadline - time.time(), 1.0)
    while time.time() < deadline:
        frac = 1.0 - max(deadline - time.time(), 0.0) / total_budget
        lr = LR if frac < 0.85 else 1e-5
        if lr != cur_lr:
            state = trainer.set_learning_rate(state, lr)
            print(f"lr -> {lr}", flush=True)
            cur_lr = lr
        idx_a = draw.integers(0, len(train_samples), BATCH - n_b)
        idx_b = draw.integers(0, len(b_samples), n_b)
        chosen = [train_samples[j] for j in idx_a] + \
                 [b_samples[j] for j in idx_b]
        examples = [pipeline.sample_to_example(
            s, rng, train=True, degrade_p=DEGRADE_P,
            degrade_hard=HARD) for s in chosen]
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
            print(f"step {step} loss {float(total):.3f} ips {ips:.0f} "
                  f"aP {avg.get('atom_target_precision', 0):.3f} "
                  f"bP {avg.get('bond_target_precision', 0):.3f} "
                  f"oP {avg.get('bond_omega_precision', 0):.3f}",
                  flush=True)
        if step % 1000 == 0:
            trainer.save_checkpoint(state, out_ckpt, step)
            key = run_eval(state, key)
            t0 = time.time()

    trainer.save_checkpoint(state, out_ckpt, step)
    key = run_eval(state, key)
    print(f"fine-tuned {step - start_step} steps "
          f"({(step - start_step) * BATCH / 1e6:.2f}M images); "
          f"weights in {out_ckpt}", flush=True)
    print("next: scripts/degraded_bench.py 128 weights_robust && "
          "scripts/cross_engine_eval.py 256 weights_robust && "
          "scripts/final_eval.py 256 weights_robust", flush=True)


if __name__ == "__main__":
    main()
