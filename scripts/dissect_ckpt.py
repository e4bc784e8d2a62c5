"""Dissect a checkpoint: per-head prediction stats at GT peak cells.

Usage: JAX_PLATFORMS=cpu python scripts/dissect_ckpt.py [ckpt_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import random

import jax.numpy as jnp
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.ops.losses import activations, compute_losses, _to_nhwc_targets
from abcnet_tpu.ops.targets import build_targets
from abcnet_tpu.train import trainer


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weights")
    cfg = trainer.TrainConfig(dtype="float32", batch_size=4)
    state = trainer.create_state(cfg)
    state = trainer.restore_checkpoint(state, ckpt)
    print(f"restored step {int(state.step)}")

    # Same generator stream as train_run eval split (seed 0, first 256).
    rng = random.Random(0)
    samples = []
    while len(samples) < 4:
        s = generate_sample(rng)
        if s is not None:
            samples.append(s)
    examples = [pipeline.sample_to_example(s, rng, train=False)
                for s in samples]
    batch = pipeline.collate(examples)

    images = pipeline.device_unpack_bits(
        jnp.asarray(batch["image_bits"]), jax.random.PRNGKey(0), train=False)
    preds = state.apply_fn({"params": state.params,
                            "batch_stats": state.batch_stats},
                           images, train=False)
    act = activations(preds)
    targets = build_targets({k: jnp.asarray(v) for k, v in batch.items()
                             if k != "image_bits"}, with_full_type=True)
    t = _to_nhwc_targets(targets)

    for head in ["atom_target", "bond_target"]:
        p = np.asarray(act[head])[..., 0]
        tt = np.asarray(t[head])[..., 0]
        centers = tt == 1.0
        bg = tt == 0.0
        print(f"{head}: p@centers mean {p[centers].mean():.4f} "
              f"min {p[centers].min():.4f} max {p[centers].max():.4f} | "
              f"p@bg mean {p[bg].mean():.5f} p99 "
              f"{np.percentile(p[bg], 99):.4f} | "
              f"centers>0.25: {(p[centers] > 0.25).mean():.3f}")

    losses = compute_losses(preds, targets,
                            {k: jnp.asarray(v) for k, v in batch.items()},
                            fused_bond_type=False)
    print({k: round(float(v), 4) for k, v in losses.items()})

    # Also check batch_stats sanity (running means/vars finite).
    flat = jax.tree_util.tree_leaves(state.batch_stats)
    print("batch_stats finite:", all(bool(np.isfinite(np.asarray(x)).all())
                                     for x in flat))


if __name__ == "__main__":
    main()
