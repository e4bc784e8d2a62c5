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

    # --- round-5 levers (VERDICT r4 #6) ---------------------------------
    # scan2/scan4: lax.scan microbatch accumulation (trainer.
    # train_step_scan) — activation memory of ONE microbatch at 2x/4x
    # effective batch, where the unrolled accum2 OOM'd.
    def scan2(s, big, r):
        s, total, _, _ = trainer.train_step_scan(s, big, r, amount=0.2,
                                                 n_micro=2)
        return s, total

    def scan4(s, big, r):
        s, total, _, _ = trainer.train_step_scan(s, big, r, amount=0.2,
                                                 n_micro=4)
        return s, total

    # rematlow: recompute the 512^2/256^2 low-channel blocks in backward
    # (their stored activations are the largest HBM write+read terms;
    # recompute is tile-starved-MXU cheap).
    from abcnet_tpu.models.unet import UNet
    REMAT_LOW = ("inc1", "inc2", "down1")

    def remat_state():
        return trainer.create_state(
            cfg, model=UNet(remat_blocks=REMAT_LOW,
                            dtype=getattr(jnp, cfg.dtype)))

    print(f"batch {B} (accum2/remat2x/scan2 use effective {2 * B}, "
          f"scan4 {4 * B})", flush=True)
    run("base", base, [state], batches, B)
    run("pallas_in", pallas_in, [state], batches, B)
    run("accum2", accum2, [state], batches2, 2 * B)
    run("remat2x", remat2x, [state], batches2, 2 * B)
    if only is None or "scan2" in only:
        run("scan2", scan2, [trainer.create_state(cfg)], batches2, 2 * B)
    if only is None or "scan4" in only:
        batches4 = [pipeline.synthetic_batch(4 * B, seed=s) for s in (4,)]
        run("scan4", scan4, [trainer.create_state(cfg)], batches4, 4 * B)
    if only is None or "rematlow" in only:
        run("rematlow", base, [remat_state()], batches, B)
    if only is None or "rematlow2x" in only:
        # remat frees capacity: try 2x batch in ONE microbatch.
        cfg2 = trainer.TrainConfig(batch_size=2 * B)
        s2 = trainer.create_state(
            cfg2, model=UNet(remat_blocks=REMAT_LOW,
                             dtype=getattr(jnp, cfg2.dtype)))
        run("rematlow2x", base, [s2], batches2, 2 * B)
    if only is None or "scan2fused" in only:
        s2 = trainer.create_state(
            cfg, model=UNet(fused_head_bank=True,
                            dtype=getattr(jnp, cfg.dtype)))
        run("scan2fused", scan2, [s2], batches2, 2 * B)

    # Fused head bank (scripts/roofline.py: the 8 OutConv 3x3s are the
    # step's largest HBM term). Same production train_step; the model's
    # head schedule differs, the math doesn't (tests/test_fused_heads.py).
    if only is None or "fusedheads" in only:
        from abcnet_tpu.models.unet import UNet
        fused_state = trainer.create_state(
            cfg, model=UNet(fused_head_bank=True,
                            dtype=getattr(jnp, cfg.dtype)))
        run("fusedheads", base, [fused_state], batches, B)

    # fusedheads OOM'd standalone at batch 128 (r4 lever table: 24.5 GB);
    # remat the head bank + the 512^2 low-channel blocks to pay for it.
    if only is None or "fusedremat" in only:
        from abcnet_tpu.models.unet import UNet
        s2 = trainer.create_state(
            cfg, model=UNet(fused_head_bank=True,
                            remat_blocks=REMAT_LOW + ("heads",),
                            dtype=getattr(jnp, cfg.dtype)))
        run("fusedremat", base, [s2], batches, B)


if __name__ == "__main__":
    main()
