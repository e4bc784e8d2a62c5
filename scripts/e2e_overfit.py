"""End-to-end slice check: generate -> train (overfit) -> decode -> score.

Mirrors SURVEY.md section 7.2 step 4: a small synthetic set, overfit on
one chip, decode the training images, require exact-match > 0. Run on
the real TPU:  python scripts/e2e_overfit.py [n_examples] [epochs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.eval.scoring import score_pairs
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    amount = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    batch = 16

    t0 = time.time()
    examples = pipeline.generate_examples(n, seed=0)
    print(f"generated {len(examples)} examples in {time.time()-t0:.1f}s")

    cfg = trainer.TrainConfig(batch_size=batch, epochs=epochs,
                              amount=amount, log_every=50,
                              eval_every=10 ** 9)
    mesh = make_mesh(1)
    state = replicate_tree(trainer.create_state(cfg), mesh)

    from abcnet_tpu.train.metrics import MeterBank
    meters = MeterBank()
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    step = 0
    for epoch in range(cfg.epochs):
        if epoch == cfg.lr_drop_epoch:
            state = trainer.set_learning_rate(state, cfg.lr * 0.1)
        for hb in pipeline.batches_from_examples(examples, batch,
                                                 seed=epoch):
            key, sub = jax.random.split(key)
            state, total, losses, mets = trainer.train_step(
                state, shard_batch(hb, mesh), sub, amount=cfg.amount)
            meters.update(mets)
            step += 1
            if step % cfg.log_every == 0:
                avg = meters.averages()
                print(f"epoch {epoch} step {step} loss {float(total):.4f} "
                      f"atomP={avg['atom_target_precision']:.3f} "
                      f"atomR={avg['atom_target_recall']:.3f} "
                      f"bondP={avg['bond_target_precision']:.3f} "
                      f"omegaP={avg['bond_omega_precision']:.3f} "
                      f"rhoMAE={avg['bond_rhos_mae']:.3f} "
                      f"typeAcc={avg['atom_types_acc']:.3f}")
                meters.reset()
    dt = time.time() - t0
    print(f"trained {step} steps in {dt:.1f}s "
          f"({step * batch / dt:.1f} img/s)")

    # Decode the (un-augmented) training images.
    truths, preds = [], []

    from abcnet_tpu.infer.decode import make_infer_pipeline
    run = make_infer_pipeline(state)

    for i in range(0, min(len(examples), 128) - batch + 1, batch):
        chunk = examples[i:i + batch]
        peaks = run(np.stack([e.image_u8 for e in chunk]))
        preds.extend(assemble_batch(peaks))
        truths.extend(e.smiles for e in chunk)
    report = score_pairs(truths, preds)
    print("E2E:", report)
    if report.exact_match > 0:
        print("E2E SLICE OK")
    else:
        # Small runs may not reach exact-match; decode health is the gate.
        print("E2E SLICE: no exact matches yet "
              f"(decode_rate={report.decode_rate:.2f}); train longer")
        sys.exit(1)


if __name__ == "__main__":
    main()
