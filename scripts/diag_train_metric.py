"""Diagnose the quantized atom train-metric (VERDICT r3 weak #4 / next #5).

Timeline fact established first: logs/ft_hard_r3.log was produced by a
process launched 14:08 UTC running scripts/finetune_hard.py@05732c9,
which computed metrics from the TRAIN-MODE forward
(train_step(with_metrics=True)); the eval-mode metric pass (4482aed)
landed 15:54, while that process was already running, so the retained
log never exercised the fix. This script supplies the missing evidence:
on the production checkpoint and the hard (mixed) corpus it measures
atom/bond detection metrics in a 2x2 of

    forward mode  in {train-mode (BN batch stats + dropout), eval-mode}
    images        in {augmented+noisy (amount=0.2), clean}

isolating whether the starvation comes from the noise or from the
forward mode. Reference metric semantics: src/train.py:145-162
(3x3-maxpool NMS at threshold 0.25).

Usage: python scripts/diag_train_metric.py [n_batches=4] [batch=16]
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
from abcnet_tpu.parallel import make_mesh, shard_batch
from abcnet_tpu.ops import losses as L
from abcnet_tpu.train import trainer
from abcnet_tpu.train import metrics as M
from abcnet_tpu.train.metrics import MeterBank

KEYS = ("atom_target_precision", "atom_target_recall",
        "atom_peaks_per_img", "atom_true_per_img",
        "bond_target_precision", "bond_peaks_per_img")


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    cfg = trainer.TrainConfig(batch_size=batch, amount=0.2)
    state = trainer.create_state(cfg)
    state = trainer.restore_checkpoint(state, os.path.join(repo, "weights"))
    print(f"checkpoint step {int(state.step)}", flush=True)
    mesh = make_mesh(1)

    rng = random.Random(99)
    if len(sys.argv) > 3 and sys.argv[3] == "pool":
        # Reproduce the ft_hard batch recipe exactly: the 90k pool with
        # HARD_FRAC=0.3 of each batch drawn from the mined-hard index
        # (scripts/finetune_hard.py:156-170) — the one condition the
        # mixed-corpus 2x2 can't cover.
        import glob
        import numpy as np
        from abcnet_tpu.data.pool import load_pool
        samples = load_pool(os.path.join(repo, "data_cache",
                                         "pool_90k.npz"))
        train_samples = samples[256:]
        hard_set = np.load(sorted(glob.glob(os.path.join(
            repo, "data_cache", "hard_idx_*.npy")))[-1])
        draw = np.random.default_rng(4000 + 56000)
        n_hard = max(1, int(batch * 0.3))
        batches = []
        for _ in range(n_batches):
            hard = draw.choice(hard_set, n_hard)
            rest = draw.integers(0, len(train_samples), batch - n_hard)
            examples = [pipeline.sample_to_example(
                train_samples[j], rng, train=True)
                for j in np.concatenate([hard, rest])]
            batches.append(pipeline.collate(examples))
        print(f"built {n_batches} x {batch} hard-recipe batches "
              f"({len(hard_set)} mined hard)", flush=True)
    else:
        gen = random.Random(31337)
        batches = []
        while len(batches) < n_batches:
            examples = []
            while len(examples) < batch:
                s = generate_sample(gen, mode="mixed")
                if s is None:
                    continue
                examples.append(pipeline.sample_to_example(s, rng,
                                                           train=True))
            batches.append(pipeline.collate(examples))
        print(f"built {n_batches} x {batch} mixed-corpus batches",
              flush=True)

    def metrics_pass(sb, sub, train_mode: bool, amount: float):
        """One forward in the requested mode; returns (num,den) metrics.
        train_mode=True reproduces the pre-4482aed metric source
        (loss_and_metrics train=True: BN batch stats + dropout)."""
        if train_mode:
            _, aux = trainer.loss_and_metrics(
                state.params, state.batch_stats, state.apply_fn,
                sb, sub, amount, True, True)
            return aux["metrics"]
        if amount == 0.0:
            # eval anchor: clean images, eval forward (eval_step path)
            images = pipeline.device_unpack_bits(
                sb["image_bits"], sub, amount=0.0, train=False)
            targets = trainer.build_targets(
                sb, with_full_type=False,
                grid=images.shape[1] // trainer.vocab.STRIDE)
            preds = state.apply_fn(
                {"params": state.params,
                 "batch_stats": state.batch_stats}, images, train=False)
            return M.compute_metrics(preds, L._to_nhwc_targets(targets))
        return trainer.train_metrics_step(state, sb, sub,
                                          amount=amount)

    cells = [
        ("train-mode + noisy  (pre-fix path)", True, 0.2),
        ("train-mode + clean", True, 0.0),
        ("eval-mode  + noisy  (train_metrics_step, the fix)", False, 0.2),
        ("eval-mode  + clean  (EVAL anchor)", False, 0.0),
    ]
    key = trainer.rng_key(21)
    for name, tm, amount in cells:
        bank = MeterBank()
        t0 = time.time()
        k = key
        for hb in batches:
            k, sub = jax.random.split(k)
            bank.update(metrics_pass(shard_batch(hb, mesh), sub, tm,
                                     amount))
        avg = bank.averages()
        line = " ".join(f"{kk}={avg.get(kk, float('nan')):.4f}"
                        for kk in KEYS)
        print(f"{name:52s} {line}  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
