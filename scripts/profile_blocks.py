"""Per-block forward+backward timing on the real chip.

The round-2 stage profile (logs/profile_bwd_r2.log) showed the train
step is conv-backward-bound (350 of ~486 ms at batch 64) but not WHERE.
This times grad(sum(block(x))) for each U-Net block separately at the
production training shapes, so the MFU push (VERDICT r2 #2) targets the
measured hog instead of a guess.

Each block is timed as an isolated jitted value_and_grad with a true
value fetch per iteration (axon tunnel: block_until_ready returns before
execution). Numbers include the tunnel RTT (~27-30 ms) — compare
against the null row. BN runs in train mode (batch stats), dropout off
(isolation from RNG cost; the rbg A/B covers that separately).

Usage: python scripts/profile_blocks.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from abcnet_tpu.models import unet as U


def timeit(fn, *args, n=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    @jax.jit
    def null():
        return jnp.zeros(())

    print(f"batch {B}")
    print(f"{'null (RTT)':24s}: {timeit(null):8.1f} ms", flush=True)

    # (name, module-ctor, input shapes). Skip connections get zeros of
    # the right shape; grads flow to params + inputs like in the real
    # step.
    blocks = [
        ("inc1  512^2  1->16", U.DoubleConv(16, dtype=dt), (B, 512, 512, 1)),
        ("inc2  512^2 16->16", U.DoubleConv(16, dtype=dt), (B, 512, 512, 16)),
        ("down1 256^2 ->32", U.Down(32, dtype=dt), (B, 512, 512, 16)),
        ("down2 128^2 ->64", U.Down(64, dtype=dt), (B, 256, 256, 32)),
        ("inc3  128^2 64->64", U.DoubleConv(64, dtype=dt), (B, 128, 128, 64)),
        ("down3  64^2 ->128", U.Down(128, dtype=dt), (B, 128, 128, 64)),
        ("down4  32^2 ->256", U.Down(256, dtype=dt), (B, 64, 64, 128)),
        ("down5  16^2 ->512", U.Down(512, dtype=dt), (B, 32, 32, 256)),
    ]
    ups = [
        ("up1    32^2 512->256", U.Up(512, 256, dtype=dt),
         (B, 16, 16, 512), (B, 32, 32, 256)),
        ("up2    64^2 256->128", U.Up(256, 128, dtype=dt),
         (B, 32, 32, 256), (B, 64, 64, 128)),
        ("up3   128^2 128->128", U.Up(128, 128, dtype=dt),
         (B, 64, 64, 128), (B, 128, 128, 64)),
    ]
    tails = [
        ("dconv 128^2 128->128", U.DoubleConv(128, dtype=dt),
         (B, 128, 128, 128)),
        ("head  128^2 ->360", U.OutConv(128, 360, dtype=dt),
         (B, 128, 128, 128)),
        ("head  128^2 ->1", U.OutConv(128, 1, dtype=dt),
         (B, 128, 128, 128)),
    ]

    def bench_block(name, mod, *shapes):
        xs = [jnp.ones(s, dt) for s in shapes]
        variables = mod.init({"params": key, "dropout": key}, *xs,
                             train=False)

        def loss(params, *xs):
            out, _ = mod.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                *xs, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return jnp.sum(out.astype(jnp.float32))

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        xs = [jax.device_put(x) for x in xs]
        ms = timeit(g, variables["params"], *xs)
        print(f"{name:24s}: {ms:8.1f} ms", flush=True)

    for name, mod, shape in blocks:
        bench_block(name, mod, shape)
    for name, mod, shape, skip in ups:
        bench_block(name, mod, shape, skip)
    for name, mod, shape in tails:
        bench_block(name, mod, shape)


if __name__ == "__main__":
    main()
