"""Command-line surface — the reference's script entry points, unified.

Maps one-to-one onto the reference's scripts:
  gen         rdkit_img_generate.py / indigo_img_generator.py
  train       src/train.py (single chip) / src/multi_gpu_train2.py (mesh)
  img2smiles  src/img2smiles2.py (+ multi_proc variants)
  cal-acc     src/cal_acc.py
  bench       (new) throughput benchmark

Unlike the reference — module-level script code with hardcoded paths
(SURVEY.md section 5, "Config") — every knob is an explicit flag with
the reference's defaults.
"""

from __future__ import annotations

import argparse
import os
import sys


def _cmd_gen(args) -> None:
    from .data.generate import generate_dataset
    smiles_list = None
    if args.smiles_csv:
        # Given-corpus rendering (rdkit_img_generate.py:219-246 role).
        import pandas as pd
        df = pd.read_csv(args.smiles_csv)
        cols = {c.lower(): c for c in df.columns}
        col = cols.get("smiles")
        if col is None:
            sys.exit(f"error: no Smiles column in {args.smiles_csv}")
        smiles_list = [str(s) for s in df[col]]
    df = generate_dataset(args.out, args.n, seed=args.seed,
                          mode=args.mode, smiles_list=smiles_list,
                          engine=args.engine)
    print(f"wrote {len(df)} samples to {args.out}")


def _cmd_train(args) -> None:
    import random

    from .data import pipeline
    from .train.trainer import TrainConfig, fit

    cfg = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                      epochs=args.epochs, amount=args.amount,
                      seed=args.seed, ckpt_dir=args.ckpt,
                      dtype=args.dtype)
    state = None
    if args.resume:
        from .train.trainer import create_state, restore_checkpoint
        state = restore_checkpoint(create_state(cfg), args.resume)
        print(f"resumed from step {int(state.step)}")
    if args.data:
        samples = pipeline.load_csv_dataset(
            os.path.join(args.data, "dataset.csv"))
    else:
        from .data.generate import generate_sample
        rng = random.Random(args.seed)
        samples = []
        while len(samples) < args.synthetic:
            s = generate_sample(rng)
            if s is not None:
                samples.append(s)
    n_test = max(len(samples) // 90, 1) if args.test_split else 0
    rng = random.Random(args.seed)
    # Eval split: fixed un-augmented examples; train split stays raw
    # Samples so fit() re-augments every epoch (utils.py:47-61 role).
    test = [pipeline.sample_to_example(s, rng, train=False)
            for s in samples[:n_test]] if n_test else None
    train = samples[n_test:]
    print(f"training on {len(train)} samples, eval on {n_test}")
    fit(cfg, train, test, state=state)


def _cmd_img2smiles(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data import pipeline
    from .eval.scoring import score_pairs, write_results_csv
    from .infer import assemble_batch
    from .train.trainer import (TrainConfig, create_state,
                                restore_checkpoint)

    csv_path = args.data if args.data.endswith(".csv") \
        else os.path.join(args.data, "dataset.csv")
    if not os.path.exists(csv_path):
        sys.exit(f"error: dataset csv not found: {csv_path}")

    cfg = TrainConfig(dtype=args.dtype)
    state = create_state(cfg)
    if args.ckpt:
        state = restore_checkpoint(state, args.ckpt)

    # Labeled dataset CSVs carry atoms_string/bonds_string; a plain
    # (image, smiles) CSV — the reference's UOB benchmark shape
    # (src/utils_for_test.py:8-38) — is detected and loaded label-free.
    import pandas as pd
    head = pd.read_csv(csv_path, nrows=0)
    if "atoms_string" in head.columns:
        samples = pipeline.load_csv_dataset(csv_path)
    else:
        samples = pipeline.load_inference_csv(csv_path)

    mesh = None
    if args.mesh:
        from .parallel import make_mesh
        mesh = make_mesh(args.mesh)
    from .infer.decode import make_infer_pipeline
    run = make_infer_pipeline(state, mesh, threshold=args.threshold)

    truths, preds_all = [], []
    bs = args.batch_size
    # Persistent assembly pool (multi_proc_img2smiles2.py Pool(32) role):
    # created ONCE for the run — a per-batch spawn pool would pay
    # interpreter startup every batch.
    pool = None
    if args.processes and args.processes > 1:
        from .infer.assemble import make_assembly_pool
        pool = make_assembly_pool(args.processes)
    # Three-way overlapped serving loop: batch i+1's device program is
    # dispatched (async) before batch i is consumed, batch i+1's peak
    # download runs on a fetch thread (device->host copies release the
    # GIL), and the main thread assembles batch i meanwhile — steady
    # state is max(compute, fetch, assemble) rather than their sum
    # (the reference serializes forward and decode,
    # img2smiles2.py:52-317; bench.py's e2e loop measures this shape).
    from concurrent.futures import ThreadPoolExecutor
    # Any pipeline callable works: one without the dispatch/fetch split
    # (e.g. a custom decode fn) degrades to dispatch=run, fetch=identity
    # — still double-buffered, just without the threaded download.
    dispatch = getattr(run, "dispatch", run)
    fetch = getattr(run, "fetch", lambda h: h)
    pending = None          # (Future -> host peaks, n_real)
    fetcher = ThreadPoolExecutor(max_workers=1)
    try:
        for i in range(0, len(samples), bs):
            chunk = samples[i:i + bs]
            k = len(chunk)
            if k < bs:
                # Pad the trailing chunk to the full batch (keeps the
                # jitted program's shape cache) and drop the padding
                # afterwards — the reference scores every row
                # (img2smiles2.py:342-344); silently truncating len%bs
                # samples is not parity.
                chunk = chunk + [chunk[-1]] * (bs - k)
            handle = dispatch(np.stack([s.image for s in chunk]))
            fut = fetcher.submit(fetch, handle)
            truths.extend(s.smiles for s in chunk[:k])
            if pending is not None:
                preds_all.extend(assemble_batch(
                    pending[0].result(), pool=pool)[:pending[1]])
            pending = (fut, k)
            if (i // bs) % 10 == 0:
                print(f"{min(i + bs, len(samples))}/{len(samples)}")
        if pending is not None:
            preds_all.extend(assemble_batch(
                pending[0].result(), pool=pool)[:pending[1]])
    finally:
        fetcher.shutdown(wait=False)
        if pool is not None:
            pool.close()
    write_results_csv(args.out, truths, preds_all)
    print(score_pairs(truths, preds_all))


def _cmd_cal_acc(args) -> None:
    import pandas as pd

    from .eval.scoring import score_pairs
    df = pd.read_csv(args.results)
    preds = [p if isinstance(p, str) and p else None
             for p in df["smiles_pred"]]
    # InChI ground truth: the reference's multiprocessing decoder scores
    # against an 'InChI' column converted through inchi2smiles
    # (multi_proc_img2smiles2.py:329-352). Same here, via the from-
    # scratch reader (chem/inchi.py).
    if "smiles" in df.columns:
        truths = list(df["smiles"])
    elif "InChI" in df.columns:
        from .chem.inchi import inchi_to_smiles
        truths = [inchi_to_smiles(x) if isinstance(x, str) else None
                  for x in df["InChI"]]
    else:
        raise SystemExit("results csv needs a 'smiles' or 'InChI' column")
    print(score_pairs(truths, preds))


def _cmd_test_acc(args) -> None:
    import random

    import jax

    from .data import pipeline
    from .eval.class_metrics import per_class_counts, per_class_report
    from .ops.losses import _to_nhwc_targets
    from .ops.targets import build_targets
    from .train.trainer import (TrainConfig, create_state,
                                restore_checkpoint)

    csv_path = os.path.join(args.data, "dataset.csv")
    if not os.path.exists(csv_path):
        sys.exit(f"error: dataset csv not found: {csv_path}")
    cfg = TrainConfig(dtype=args.dtype)
    state = create_state(cfg)
    if args.ckpt:
        state = restore_checkpoint(state, args.ckpt)
    samples = pipeline.load_csv_dataset(csv_path)
    rng = random.Random(0)
    examples = [pipeline.sample_to_example(s, rng, train=False)
                for s in samples]

    @jax.jit
    def run(batch):
        images = pipeline.device_unpack_bits(batch["image_bits"],
                                             jax.random.PRNGKey(0),
                                             train=False)
        preds = state.apply_fn({"params": state.params,
                                "batch_stats": state.batch_stats},
                               images, train=False)
        targets = _to_nhwc_targets(build_targets(batch,
                                                 with_full_type=True))
        return per_class_counts(preds, targets)

    import numpy as np
    acc = None
    for hb in pipeline.batches_from_examples(examples, args.batch_size,
                                             shuffle=False):
        counts = {k: tuple(np.asarray(x) for x in v)
                  for k, v in run(hb).items()}
        if acc is None:
            acc = counts
        else:
            acc = {k: tuple(a + b for a, b in zip(acc[k], counts[k]))
                   for k in acc}
    print(per_class_report(acc))


def _cmd_bench(args) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    bench.main(args.bench_args)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="abcnet_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a synthetic dataset")
    g.add_argument("--out", required=True)
    g.add_argument("-n", type=int, default=1000,
                   help="sample count (with --smiles-csv: cap, 0 = all)")
    g.add_argument("--mode", default="mixed",
                   choices=["mixed", "rdkit", "indigo"])
    g.add_argument("--engine", default="a", choices=["a", "b", "mix"],
                   help="drawing program: a = PIL/TTF engine, b = "
                        "stroke-font scanline engine, mix = per-sample "
                        "coin flip (two-renderer corpus diversity)")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--smiles-csv",
                   help="render this SMILES corpus (CSV with a Smiles "
                        "column) instead of random molecules — "
                        "rdkit_img_generate.py:219-246 role")
    g.set_defaults(fn=_cmd_gen)

    t = sub.add_parser("train", help="train the U-Net")
    t.add_argument("--data", help="dataset dir (omit to generate)")
    t.add_argument("--synthetic", type=int, default=2000,
                   help="#examples to generate when --data omitted")
    t.add_argument("-b", "--batch-size", type=int, default=64)
    t.add_argument("--lr", type=float, default=2.5e-4)
    t.add_argument("--epochs", type=int, default=30)
    t.add_argument("--amount", type=float, default=0.2)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--ckpt", help="checkpoint dir")
    t.add_argument("--dtype", default="bfloat16")
    t.add_argument("--test-split", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="hold out 1/90 for eval (--no-test-split to "
                        "train on everything; reference split "
                        "train.py:19-21)")
    t.add_argument("--resume", help="checkpoint dir to resume from")
    t.set_defaults(fn=_cmd_train)

    i = sub.add_parser("img2smiles", help="decode a dataset to SMILES")
    i.add_argument("--data", required=True,
                   help="dataset dir (dataset.csv inside) or a CSV path; "
                        "label columns optional — a plain (image, smiles) "
                        "CSV like the UOB benchmark works")
    i.add_argument("--ckpt")
    i.add_argument("--out", default="results.csv")
    i.add_argument("-b", "--batch-size", type=int, default=64)
    i.add_argument("--processes", type=int, default=0)
    i.add_argument("--mesh", type=int, default=0,
                   help="shard inference batches over N devices")
    i.add_argument("--threshold", type=float, default=0.6,
                   help="binarize threshold (reference: 0.6 synthetic, "
                        "0.2 scanned benchmarks, utils_for_test.py:23)")
    i.add_argument("--dtype", default="bfloat16")
    i.set_defaults(fn=_cmd_img2smiles)

    c = sub.add_parser("cal-acc", help="score a results csv")
    c.add_argument("results")
    c.set_defaults(fn=_cmd_cal_acc)

    ta = sub.add_parser("test-acc",
                        help="per-class P/R tables (test_accuracy parity)")
    ta.add_argument("--data", required=True)
    ta.add_argument("--ckpt")
    ta.add_argument("-b", "--batch-size", type=int, default=16)
    ta.add_argument("--dtype", default="bfloat16")
    ta.set_defaults(fn=_cmd_test_acc)

    b = sub.add_parser("bench", help="throughput benchmark")
    b.add_argument("bench_args", nargs=argparse.REMAINDER,
                   help="flags forwarded to bench.py (e.g. --dense)")
    b.set_defaults(fn=_cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
