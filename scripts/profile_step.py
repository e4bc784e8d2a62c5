"""Decompose train-step time into stages (run on the real chip).

Times each jitted sub-program separately: preprocess+targets, forward,
forward+losses, full train step with/without metrics, inference
pipeline. Usage: python scripts/profile_step.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from abcnet_tpu.data import pipeline
from abcnet_tpu.infer.decode import extract_peaks
from abcnet_tpu.ops import losses as L
from abcnet_tpu.ops.targets import build_targets
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = trainer.TrainConfig(batch_size=batch_size)
    mesh = make_mesh(1)
    state = replicate_tree(trainer.create_state(cfg), mesh)
    hb = pipeline.synthetic_batch(batch_size, seed=0)
    batch = shard_batch(hb, mesh)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def prep_targets(batch, key):
        images = pipeline.device_unpack_bits(batch["image_bits"], key)
        targets = build_targets(batch)
        return images, targets

    @jax.jit
    def forward(state, batch, key):
        images = pipeline.device_unpack_bits(batch["image_bits"], key)
        return state.apply_fn({"params": state.params,
                               "batch_stats": state.batch_stats},
                              images, train=True,
                              mutable=["batch_stats"],
                              rngs={"dropout": key})

    @jax.jit
    def fwd_loss(state, batch, key):
        total, aux = trainer.loss_and_metrics(
            state.params, state.batch_stats, state.apply_fn, batch, key,
            0.2, True, with_metrics=False)
        return total

    @jax.jit
    def infer(state, batch):
        images = pipeline.device_unpack_bits(batch["image_bits"],
                                             jax.random.PRNGKey(0),
                                             train=False)
        preds = state.apply_fn({"params": state.params,
                                "batch_stats": state.batch_stats},
                               images, train=False)
        return extract_peaks(preds)

    print(f"batch {batch_size}")
    print(f"preprocess+targets : {timeit(prep_targets, batch, key):8.1f} ms")
    print(f"forward (train)    : {timeit(forward, state, batch, key):8.1f} ms")
    print(f"forward+losses     : {timeit(fwd_loss, state, batch, key):8.1f} ms")
    print(f"inference pipeline : {timeit(infer, state, batch):8.1f} ms")

    def step_m(state, batch, key):
        s2, total, losses, mets = trainer.train_step(state, batch, key,
                                                     amount=0.2,
                                                     with_metrics=True)
        return total

    def step_nm(state, batch, key):
        s2, total, losses, mets = trainer.train_step(state, batch, key,
                                                     amount=0.2,
                                                     with_metrics=False)
        return total

    # train_step donates state; keep a fresh copy per timed call set.
    import copy
    st = jax.tree_util.tree_map(jnp.array, state)
    print(f"full step +metrics : "
          f"{timeit(lambda b, k: step_m(jax.tree_util.tree_map(jnp.array, st), b, k), batch, key):8.1f} ms (incl. state copy)")
    print(f"full step -metrics : "
          f"{timeit(lambda b, k: step_nm(jax.tree_util.tree_map(jnp.array, st), b, k), batch, key):8.1f} ms (incl. state copy)")


if __name__ == "__main__":
    main()
