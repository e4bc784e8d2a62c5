"""Decompose train-step/inference time into stages (run on the real chip).

Times each jitted sub-program separately with a true device->host VALUE
FETCH per iteration (under the axon tunnel block_until_ready returns
before execution — fetching a value is the only reliable barrier; see
bench.py), and reports a null-program round-trip so stage times can be
read net of tunnel latency.

Stages: null (RTT), preprocess+targets, forward (train), forward+losses,
inference pipeline (XLA NMS), inference pipeline (Pallas NMS), full
train step with/without metrics.

Usage: python scripts/profile_step.py [batch] [stage,stage,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from abcnet_tpu.data import pipeline
from abcnet_tpu.infer.decode import DecodeConfig, extract_peaks
from abcnet_tpu.ops.targets import build_targets
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer


def timeit(fn, *args, n=8, warmup=2):
    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] * 1000.0


def report(label, fn, *args):
    """One stage; a failing stage (e.g. a kernel the backend rejects)
    must not kill the rest of the profile."""
    try:
        print(f"{label}: {timeit(fn, *args):8.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    cfg = trainer.TrainConfig(batch_size=batch_size)
    mesh = make_mesh(1)
    state = replicate_tree(trainer.create_state(cfg), mesh)
    hb = pipeline.synthetic_batch(batch_size, seed=0)
    batch = shard_batch(hb, mesh)
    key = jax.random.PRNGKey(0)

    def want(name):
        return only is None or name in only

    print(f"batch {batch_size}", flush=True)

    if want("null"):
        @jax.jit
        def null(x):
            return x + 1
        x0 = jnp.zeros((8,), jnp.float32)
        report("null round-trip    ", null, x0)

    if want("targets"):
        @jax.jit
        def prep_targets(batch, key):
            images = pipeline.device_unpack_bits(batch["image_bits"], key)
            targets = build_targets(batch)
            return images, targets
        report("preprocess+targets ", prep_targets, batch, key)

    if want("forward"):
        @jax.jit
        def forward(state, batch, key):
            images = pipeline.device_unpack_bits(batch["image_bits"], key)
            return state.apply_fn({"params": state.params,
                                   "batch_stats": state.batch_stats},
                                  images, train=True,
                                  mutable=["batch_stats"],
                                  rngs={"dropout": key})
        report("forward (train)    ", forward, state, batch, key)

    if want("fwdloss"):
        @jax.jit
        def fwd_loss(state, batch, key):
            total, aux = trainer.loss_and_metrics(
                state.params, state.batch_stats, state.apply_fn, batch,
                key, 0.2, True, with_metrics=False)
            return total
        report("forward+losses     ", fwd_loss, state, batch, key)

    if want("infer") or want("infer_pallas"):
        def make_infer(decode_cfg):
            @jax.jit
            def infer(state, batch):
                images = pipeline.device_unpack_bits(
                    batch["image_bits"], jax.random.PRNGKey(0),
                    train=False)
                preds = state.apply_fn({"params": state.params,
                                        "batch_stats": state.batch_stats},
                                       images, train=False)
                return extract_peaks(preds, decode_cfg)
            return infer
        if want("infer"):
            f = make_infer(DecodeConfig())
            report("infer (XLA NMS)    ", f, state, batch)
        if want("infer_pallas"):
            f = make_infer(DecodeConfig(use_pallas_nms=True))
            report("infer (Pallas NMS) ", f, state, batch)

    if want("grads"):
        @jax.jit
        def grads_only(state, batch, key):
            grad_fn = jax.value_and_grad(trainer.loss_and_metrics,
                                         has_aux=True)
            (total, aux), grads = grad_fn(
                state.params, state.batch_stats, state.apply_fn, batch,
                key, 0.2, True, False)
            return total, grads
        report("fwd+bwd (no opt)   ", grads_only, state, batch, key)

    if want("grads_rbg"):
        # Same fwd+bwd but with an rbg-impl PRNG key: threefry bit
        # generation for the 8 dropout masks + salt/pepper noise is
        # pure VPU work; rbg is the cheap hardware generator. The gap
        # between this and `grads` is the RNG cost in the step.
        @jax.jit
        def grads_rbg(state, batch, key):
            grad_fn = jax.value_and_grad(trainer.loss_and_metrics,
                                         has_aux=True)
            (total, aux), grads = grad_fn(
                state.params, state.batch_stats, state.apply_fn, batch,
                key, 0.2, True, False)
            return total, grads
        rbg_key = jax.random.PRNGKey(0, impl="rbg")
        report("fwd+bwd (rbg rng)  ", grads_rbg, state, batch, rbg_key)

    if want("adam"):
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        @jax.jit
        def adam_only(state, grads):
            updates, opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
            params = optax.apply_updates(state.params, updates)
            return jax.tree_util.tree_leaves(params)[0]
        report("adam update only   ", adam_only, state, zero_grads)

    if want("step") or want("step_metrics"):
        def step_fn(with_metrics):
            def go(st, batch, key):
                st2, total, losses, mets = trainer.train_step(
                    jax.tree_util.tree_map(jnp.array, st), batch, key,
                    amount=0.2, with_metrics=with_metrics)
                return total
            return go
        if want("step"):
            report("full step -metrics ", step_fn(False), state, batch, key)
        if want("step_metrics"):
            report("full step +metrics ", step_fn(True), state, batch, key)


if __name__ == "__main__":
    main()
