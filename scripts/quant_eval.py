"""int8-backbone serving: accuracy gate (and, on chip, throughput A/B).

Calibrates the PTQ bundle (infer/quant.py) on freshly generated images,
then runs the SAME held-out molecule stream through the bf16 sparse
pipeline and the int8-backbone pipeline and prints paired e2e scores.
Adoption rule: int8 must lose <1 point of exact match to be worth the
2x MXU peak; otherwise it is retired with numbers (CBAM/Pallas-NMS
protocol).

On the chip this also times both device pipelines (value-fetch per
iteration, bench.py protocol).

Usage: python scripts/quant_eval.py [n=48] [calib_n=32] [ckpt_dir]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.eval.scoring import score_pairs
from abcnet_tpu.infer import assemble_batch
from abcnet_tpu.infer.decode import make_infer_pipeline
from abcnet_tpu.infer.quant import prepare_quant
from abcnet_tpu.train import trainer

EVAL_BATCH = 16


def gen_pool(seed, n):
    rng = random.Random(seed)
    out = []
    while len(out) < n:
        s = generate_sample(rng, mode="mixed")
        if s is not None:
            out.append(s)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    calib_n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, "weights")
    n = (n // EVAL_BATCH) * EVAL_BATCH

    cfg = trainer.TrainConfig()
    state = trainer.create_state(cfg)
    junk = ""
    try:
        state = trainer.restore_checkpoint(state, ckpt_dir)
        print(f"ckpt step {int(state.step)}", flush=True)
    except (FileNotFoundError, OSError):
        # No trained checkpoint on this box (the VM rebuild wiped
        # weights/): the accuracy gate below is then meaningless junk,
        # but the chip throughput A/B is weight-VALUE-agnostic — int8
        # vs bf16 conv speed depends only on shapes/dtypes — so run
        # through with random init and tag the gate rows THEMSELVES
        # (ADVICE r4: a separate banner is missable by log scrapers).
        junk = ",RANDOM-INIT-JUNK"
        print("ckpt MISSING — random init: accuracy rows are junk, "
              "throughput A/B is valid", flush=True)

    # Calibration stream is disjoint from the eval stream by seed.
    calib = gen_pool(660001, calib_n)
    # Same preprocessing as serving: ink mask at the default threshold.
    calib_ink = (np.stack([s.image for s in calib]).astype(np.float32)
                 / 255.0 < 0.6).astype(np.float32)[..., None]
    t0 = time.time()
    Q = prepare_quant(state, calib_ink)
    print(f"calibrated on {calib_n} images ({time.time() - t0:.0f}s)",
          flush=True)

    pool = gen_pool(660002, n)
    truths = [s.smiles for s in pool]

    runners = (("bf16", make_infer_pipeline(state)),
               ("int8", make_infer_pipeline(state, quant=Q)))
    for label, run in runners:
        preds, t0 = [], time.time()
        for i in range(0, n, EVAL_BATCH):
            chunk = pool[i:i + EVAL_BATCH]
            peaks = run(np.stack([s.image for s in chunk]))
            preds.extend(assemble_batch(peaks))
        print(f"E2E[{label}{junk}] {score_pairs(truths, preds)} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # Chip-only throughput A/B (bench.py value-fetch protocol; the CPU
    # lowering of s8xs8->s32 convs says nothing about the int8 MXU).
    if jax.default_backend() != "tpu":
        print("throughput A/B skipped (backend is not tpu)", flush=True)
        return
    bsz, iters = 64, 10
    imgs = np.stack([pool[i % len(pool)].image for i in range(bsz)])
    for label, run in runners:
        out = run(imgs)                       # warmup (compile)
        np.asarray(out["atom_score"])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = run(imgs)
            np.asarray(out["atom_score"])     # value fetch = completion
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"THROUGHPUT[{label}] batch={bsz} med={med*1e3:.1f}ms "
              f"ips={bsz/med:.1f}", flush=True)


if __name__ == "__main__":
    main()
