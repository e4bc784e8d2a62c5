"""Measured ms/step for each train-throughput lever (VERDICT r3 next
#2: 192 -> >=300 img/s at batch 128).

Levers, each an independent jitted program timed with a per-iteration
value fetch (axon tunnel: block_until_ready returns before execution):

  base        production train_step at --batch
  pallas_in   + fused Pallas input kernel (ops/pallas_input.py)
  accum2      gradient accumulation: 2 microbatches of --batch, one
              Adam update (tests whether Adam/target/dispatch overheads
              amortize at effective 2x batch)
  remat2x     full-remat loss at 2x batch in ONE microbatch (activation
              memory halved, forward recomputed during backward —
              wins only if batch-2x was HBM-capacity-bound)

Prints a table plus img/s; run AFTER profile_blocks/profile_step so the
adopted lever targets the measured hog.

Usage: python scripts/mfu_levers.py [batch=128] [iters=8] [levers=all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from abcnet_tpu.data import pipeline
from abcnet_tpu.train import trainer


def timed(fn, states, batches, rngs, iters):
    s = states[0]
    s, total = fn(s, batches[0], rngs[0])
    float(total)                       # value fetch = real completion
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        s, total = fn(s, batches[i % len(batches)], rngs[i % len(rngs)])
        float(total)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    cfg = trainer.TrainConfig(batch_size=B)
    state = trainer.create_state(cfg)
    rngs = [trainer.rng_key(s) for s in (1, 2)]
    batches = [pipeline.synthetic_batch(B, seed=s) for s in (0, 1)]
    batches2 = [pipeline.synthetic_batch(2 * B, seed=s) for s in (2, 3)]

    def run(name, fn, states, bats, imgs_per_step):
        if only and name not in only:
            return
        # Deep-copy the state per lever: every lever's step donates its
        # input state, which would delete the shared initial buffers.
        fresh = jax.tree_util.tree_map(
            lambda x: jnp.array(x) if isinstance(x, jax.Array) else x,
            states[0])
        ms = timed(fn, [fresh], bats, rngs, iters)
        print(f"{name:10s}: {ms:8.1f} ms/step  "
              f"{imgs_per_step / (ms / 1e3):7.1f} img/s", flush=True)

    # base / pallas_in reuse the production step.
    def base(s, b, r):
        s, total, _, _ = trainer.train_step(s, b, r, amount=0.2,
                                            with_metrics=False)
        return s, total

    def pallas_in(s, b, r):
        s, total, _, _ = trainer.train_step(s, b, r, amount=0.2,
                                            with_metrics=False,
                                            use_pallas_input=True)
        return s, total

    # Gradient accumulation: grads averaged over 2 microbatches, one
    # optimizer update. Same optimizer semantics at 2x effective batch.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def accum2(s, big, r):
        r1, r2 = jax.random.split(r)
        half = {k: v[:B] for k, v in big.items()}
        half2 = {k: v[B:] for k, v in big.items()}
        gfn = jax.value_and_grad(trainer.loss_and_metrics, has_aux=True)
        (t1, a1), g1 = gfn(s.params, s.batch_stats, s.apply_fn, half,
                           r1, 0.2, True, False)
        (t2, a2), g2 = gfn(s.params, a1["batch_stats"], s.apply_fn,
                           half2, r2, 0.2, True, False)
        grads = jax.tree_util.tree_map(lambda x, y: (x + y) * 0.5, g1, g2)
        updates, opt_state = s.tx.update(grads, s.opt_state, s.params)
        params = optax.apply_updates(s.params, updates)
        s = s.replace(step=s.step + 1, params=params,
                      batch_stats=a2["batch_stats"], opt_state=opt_state)
        return s, (t1 + t2) * 0.5

    # Full remat at 2x batch in one microbatch.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def remat2x(s, big, r):
        lfn = jax.checkpoint(
            lambda p, bs, b, r: trainer.loss_and_metrics(
                p, bs, s.apply_fn, b, r, 0.2, True, False),
            static_argnums=())
        (total, aux), grads = jax.value_and_grad(
            lfn, has_aux=True)(s.params, s.batch_stats, big, r)
        updates, opt_state = s.tx.update(grads, s.opt_state, s.params)
        params = optax.apply_updates(s.params, updates)
        s = s.replace(step=s.step + 1, params=params,
                      batch_stats=aux["batch_stats"], opt_state=opt_state)
        return s, total

    print(f"batch {B} (accum2/remat2x use effective {2 * B})", flush=True)
    run("base", base, [state], batches, B)
    run("pallas_in", pallas_in, [state], batches, B)
    run("accum2", accum2, [state], batches2, 2 * B)
    run("remat2x", remat2x, [state], batches2, 2 * B)

    # Fused head bank (scripts/roofline.py: the 8 OutConv 3x3s are the
    # step's largest HBM term). Same production train_step; the model's
    # head schedule differs, the math doesn't (tests/test_fused_heads.py).
    if only is None or "fusedheads" in only:
        from abcnet_tpu.models.unet import UNet
        fused_state = trainer.create_state(
            cfg, model=UNet(fused_head_bank=True,
                            dtype=getattr(jnp, cfg.dtype)))
        run("fusedheads", base, [fused_state], batches, B)


if __name__ == "__main__":
    main()
