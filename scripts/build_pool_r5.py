"""Round-5 training pool: eval split frozen, train split rebalanced.

Layout (one npz via data/pool.py):
  [0:256]     eval split — generated EXACTLY as rounds 2-4 (seed-0
              stream, mode="mixed", engine "a") so accuracy numbers
              stay comparable across rounds.
  [256:90256] train split — the same seed-0 stream continued, but with
              the round-5 rebalance driven by the round-4 failure
              taxonomy (logs/failure_taxonomy_r4.log, VERDICT r4 #5):
                * indigo-lineage fraction 0.5 -> 0.6 (indigo struct
                  failures 18.4% vs rdkit 9.8%: more dearomatized
                  kekule + hnums signal)
                * engine-B pixels at p=0.15 (cross-engine transfer,
                  VERDICT r4 #3; reference gets two-renderer diversity
                  from RDKit-SVG vs Indigo-PNG,
                  rdkit_img_generate.py:89-126 / indigo_img_generator.py)

Bias decisions come from a SEPARATE rng so the generator's seed-0
stream consumption is unchanged for the eval prefix.

Usage: python scripts/build_pool_r5.py [out_npz] [train_n]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.data.pool import save_pool

EVAL_N = 256
INDIGO_P = 0.6
ENGINE_B_P = 0.15


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/data_cache/pool_r5.npz"
    train_n = int(sys.argv[2]) if len(sys.argv) > 2 else 90000
    rng = random.Random(0)        # the sample stream (rounds 2-4 parity)
    bias = random.Random(777)     # round-5 rebalance decisions only
    t0 = time.time()
    samples = []
    while len(samples) < EVAL_N + train_n:
        if len(samples) < EVAL_N:
            s = generate_sample(rng)          # frozen eval recipe
        else:
            mode = "indigo" if bias.random() < INDIGO_P else "rdkit"
            engine = "b" if bias.random() < ENGINE_B_P else "a"
            s = generate_sample(rng, mode=mode, engine=engine)
        if s is not None:
            samples.append(s)
            if len(samples) % 10000 == 0:
                print(f"gen {len(samples)}/{EVAL_N + train_n} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    save_pool(out, samples)
    print(f"pool cached: {len(samples)} samples -> {out} "
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
