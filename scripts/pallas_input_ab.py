"""A/B the fused Pallas input kernel vs the XLA unpack+noise path on
the real chip (VERDICT r3 weak #7's named candidate).

Times both as standalone jitted programs (value-fetch per iteration —
the axon tunnel returns before execution otherwise) and prints the
per-step delta at the production batch. The kernel only enters the
production train step if this measures a real win.

Usage: python scripts/pallas_input_ab.py [batch=128] [iters=10]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.ops.pallas_input import fused_unpack_noise


def timeit(fn, args_list, n):
    out = fn(*args_list[0])
    np.asarray(out).ravel()[:1]
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        out = fn(*args_list[i % len(args_list)])
        np.asarray(out).ravel()[:1]
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(0)
    bufs = [jax.device_put(jnp.asarray(np.packbits(
        rng.random((B, 512, 512)) < 0.06, axis=-1)))
        for _ in range(2)]
    keys = [jax.random.key(s, impl="rbg") for s in (1, 2)]

    xla = jax.jit(lambda b, k: pipeline.device_unpack_bits(
        b, k, amount=0.2, train=True).astype(jnp.bfloat16))
    pallas = jax.jit(lambda b, k: fused_unpack_noise(
        b, k, amount=0.2, train=True))

    args = [(bufs[i % 2], keys[i % 2]) for i in range(2)]
    ms_x = timeit(xla, args, iters)
    ms_p = timeit(pallas, args, iters)
    print(f"batch {B}: XLA unpack+noise {ms_x:.2f} ms | "
          f"Pallas fused {ms_p:.2f} ms | delta {ms_x - ms_p:+.2f} ms "
          f"({(ms_x - ms_p) / max(ms_x, 1e-9) * 100:+.1f}%)", flush=True)

    # Consistency: eval-mode outputs must agree bit-for-bit on chip too.
    a = np.asarray(pipeline.device_unpack_bits(
        bufs[0], keys[0], amount=0.0, train=False))
    b = np.asarray(fused_unpack_noise(
        bufs[0], keys[0], amount=0.0, train=False), np.float32)
    assert (a[..., 0] == b[..., 0]).all(), "eval-mode unpack mismatch"
    print("eval-mode bit-exact on chip: OK", flush=True)


if __name__ == "__main__":
    main()
