"""Headline benchmark: batch-64 inference pipeline images/sec/chip.

Measures the reference's headline workload (img2smiles2.py batch loop:
preprocess -> U-Net forward -> heatmap NMS/peak decode) as one fused
XLA program on a single TPU chip — BASELINE.json's
"images/sec/chip at batch 64" — plus a train-step benchmark
(fwd+bwd+Adam+targets, train.py:83-141 role).

Measurement discipline (round-1 recorded a physically impossible
38.8k img/s by re-dispatching the same program on the same buffer and
blocking once at the end — over the async axon tunnel that measures
dispatch, not execution):
  * fresh input batch every iteration (ROTATE pre-staged device buffers,
    each holding different data);
  * a data dependency chained across iterations — a reduction of
    iteration i's output is XOR-folded into iteration i+1's input bits,
    so no two iterations can overlap or be CSE'd;
  * a real device->host VALUE FETCH every iteration (np.asarray of an
    output) — under the axon tunnel even block_until_ready returns
    before execution finishes, so readiness alone still times dispatch
    (the sanity bound below caught exactly that); a value cannot cross
    to the host before it exists;
  * implied TFLOP/s computed from the compiled program's own XLA cost
    analysis and REJECTED if it exceeds chip peak (a v5e does ~394
    TFLOP/s bf16 with sparsity off the table; anything near or above
    peak means the timing is broken, not that the code is fast);
  * a contention check: other busy python processes invalidate the run.

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is against an analytic estimate of its GPU inference
rate: ~104 GFLOP/image forward at 512x512; a V100-class GPU sustaining
~35% of 15.7 TFLOP/s fp32 on this conv mix -> ~53 img/s, rounded to
REF_BASELINE_IPS = 55.0. North-star: >= 5x.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip",
   "vs_baseline": N, ...diagnostics}
"""

import argparse
import json
import os
import subprocess
import sys
import time

REF_BASELINE_IPS = 55.0
WARMUP = 3
ITERS = 20
N_BUFFERS = 4            # distinct pre-staged input batches, rotated
TPU_PEAK_TFLOPS = 394.0  # v5e bf16 peak per chip (upper sanity bound)

def _parse_args(argv=None):
    """Parse at call time, never at import time: `python -m abcnet_tpu
    bench` imports this module with the leftover 'bench' token still in
    sys.argv, which a module-scope parse_args() turns into SystemExit 2.
    """
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64,
                    help="inference batch (headline stays 64 for the "
                         "BASELINE.json comparison; larger for sweeps)")
    ap.add_argument("--train-batch", type=int, default=128,
                    help="production training batch (round-3 A/B: batch "
                         "128 + rbg RNG = 666 ms/step vs 874 ms at "
                         "batch-64 rate; batch 256 OOMs in the backward)")
    ap.add_argument("--dense", action="store_true",
                    help="A/B: dense head maps instead of the sparse "
                         "peak-cell head evaluation")
    ap.add_argument("--skip-train", action="store_true")
    return ap.parse_args(argv)


def _tunnel_alive() -> bool:
    """Fast relay probe: if the axon relay is not even listening, JAX
    burns ~30 min in silent transport retries before erroring — fail
    soft in seconds instead. Any HTTP status (even an error page) means
    the relay answers; only a connect failure ('000') means dead. A CPU
    run (JAX_PLATFORMS=cpu) never needs the relay."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return True
    try:
        out = subprocess.run(
            ["curl", "-s", "-m", "5", "-o", "/dev/null",
             "-w", "%{http_code}", "http://127.0.0.1:8083/"],
            capture_output=True, text=True, timeout=10).stdout.strip()
        return out != "000"
    except Exception:
        return True  # probe tooling missing: let JAX try normally


def _chain_ancestor(pid: int) -> bool:
    """True if `pid` is an ancestor of this process (i.e. we ARE the
    chain's own bench stage — never pause our parent)."""
    cur = os.getpid()
    for _ in range(32):
        try:
            with open(f"/proc/{cur}/stat") as f:
                cur = int(f.read().split(")")[-1].split()[1])
        except Exception:
            return False
        if cur == pid:
            return True
        if cur <= 1:
            return False
    return False


# Known chip-holding job families: (relaunch-loop pid file, active-stage
# pid file, stage is a setsid process-group leader). The r5 training
# watchdog setsids its python so the stage kill must take the whole
# group or the grandchild survives holding the chip (ADVICE r4).
_CHIP_HOLDERS = [
    ("/tmp/round4_chain.pid", "/tmp/round4_stage.pid", False),
    ("/tmp/watchdog_r5.pid", "/tmp/train_r5.pid", True),
    ("/tmp/watchdog_r5e.pid", "/tmp/train_r5.pid", True),
    ("/tmp/round5d_chain.pid", "/tmp/round5d_stage.pid", True),
    ("/tmp/round5e_chain.pid", "/tmp/round5e_stage.pid", True),
    ("/tmp/round5f_chain.pid", "/tmp/round5f_stage.pid", True),
]


def _pause_chain():
    """Priority protocol vs chip-holding jobs (chip chains, the live
    r5 trainer): the TPU is claimed exclusively per process, so a bench
    started while another job holds it hangs at backend init
    (BENCH_r03's failure mode must not recur). SIGSTOP each relaunch
    loop (so it cannot respawn), kill its active stage (orbax
    checkpoints every 2500 steps bound the loss), and wait for the chip
    to free. Returns the list of loop pids to SIGCONT, or None."""
    import signal
    paused = []
    for loop_file, stage_file, group in _CHIP_HOLDERS:
        try:
            with open(loop_file) as f:
                chain = int(f.read().strip())
            os.kill(chain, 0)
        except Exception:
            continue
        if _chain_ancestor(chain):
            continue
        try:
            os.kill(chain, signal.SIGSTOP)
        except Exception:
            continue
        paused.append(chain)
        try:
            with open(stage_file) as f:
                stage = int(f.read().strip())
            kill = os.killpg if group else os.kill
            kill(stage, signal.SIGTERM)
            time.sleep(3)
            kill(stage, signal.SIGKILL)
        except Exception:
            pass
    if not paused:
        return None
    for _ in range(30):          # wait for the tunnel to release the chip
        if _other_busy_python() == 0:
            break
        time.sleep(2)
    print(f"bench: paused {len(paused)} chip job(s) for exclusive "
          "measurement", file=sys.stderr)
    return paused


def _resume_chain(chains) -> None:
    if not chains:
        return
    import signal
    for chain in chains:
        try:
            os.kill(chain, signal.SIGCONT)
        except Exception:
            continue
    print("bench: resumed paused chip job(s)", file=sys.stderr)


def _other_busy_python() -> int:
    """Count other python processes using >20% CPU (chip/CPU contention
    invalidates the measurement; round-1's number was taken while a
    training job held the chip)."""
    me = os.getpid()
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,pcpu,comm"], capture_output=True,
            text=True, timeout=10).stdout
    except Exception:
        return 0
    n = 0
    for line in out.splitlines()[1:]:
        parts = line.split()
        if len(parts) >= 3 and "python" in parts[2]:
            try:
                if int(parts[0]) != me and float(parts[1]) > 20.0:
                    n += 1
            except ValueError:
                pass
    return n


def _program_gflops(jitted, *args) -> float:
    """FLOPs of the compiled program from XLA's own cost analysis."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) / 1e9
    except Exception:
        return 0.0


def _timed_loop(step_fn, buffers, iters, block_fn):
    """Per-iteration timed loop with a cross-iteration data dependency.

    step_fn(buf, carry) -> (output, carry'); carry' is derived from the
    output, forcing iteration i+1's program to consume iteration i's
    result. block_fn(output) blocks on device completion.
    """
    import numpy as np
    carry = np.uint8(0)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out, carry = step_fn(buffers[i % len(buffers)], carry)
        block_fn(out)
        times.append(time.perf_counter() - t0)
    return times


def main(argv=None) -> None:
    """Parse args, probe the tunnel, and run — emitting a valid JSON
    line with an ``error`` field (exit 0) instead of a traceback when
    the TPU backend is unreachable (BENCH_r03 was rc=1 for exactly
    that; the driver needs a parseable line either way)."""
    args = _parse_args(argv)
    if not _tunnel_alive():
        print(json.dumps({
            "metric": "img2smiles_batch64_inference_throughput",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": "axon relay not answering on 127.0.0.1:8083 "
                     "(TPU tunnel down); no measurement taken",
        }))
        return
    chain = None
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
        chain = _pause_chain()
    try:
        _run(args)
    except BaseException as e:  # incl. SystemExit from sanity bounds
        if isinstance(e, KeyboardInterrupt):
            raise
        print(json.dumps({
            "metric": "img2smiles_batch64_inference_throughput",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
    finally:
        _resume_chain(chain)


def _run(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    BATCH = args.batch

    from abcnet_tpu.data import pipeline
    from abcnet_tpu.infer.decode import (DENSE_HEADS_SPARSE_MODE,
                                         DecodeConfig, extract_peaks,
                                         extract_peaks_sparse)
    from abcnet_tpu.models.unet import UNet, init_unet
    from abcnet_tpu.train import trainer

    contended = _other_busy_python()
    if contended:
        print(f"bench: WARNING {contended} other busy python process(es) "
              "— numbers unreliable", file=sys.stderr)

    model = UNet(dtype=jnp.bfloat16)
    variables = init_unet(jax.random.PRNGKey(0), model)
    # Trained weights when available: the host-assembly stage (and the
    # e2e img/s) depend on the peak profile, and a random-init net on
    # real images is not the serving workload.
    repo = os.path.dirname(os.path.abspath(__file__))
    ckpt_dir = os.path.join(repo, "weights")
    st = None
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        try:
            from abcnet_tpu.train import trainer as _tr
            cfg0 = _tr.TrainConfig()
            st = _tr.restore_checkpoint(_tr.create_state(cfg0), ckpt_dir)
            print(f"bench: using trained checkpoint step {int(st.step)}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"bench: orbax restore failed ({e}), trying snapshot",
                  file=sys.stderr)
            st = None
    if st is None:
        # Disaster fallback: the f16 snapshot committed to git (the
        # round-4 VM rebuild wiped weights/ and the driver benched
        # random-init junk; snapshots/*.npz survive with the repo).
        snap = os.path.join(repo, "snapshots", "r5_latest.npz")
        if os.path.isfile(snap):
            sys.path.insert(0, repo)
            from abcnet_tpu.train import trainer as _tr
            from scripts.snapshot_weights import _unflatten
            z = np.load(snap)
            tree = _unflatten({k: z[k] for k in z.files
                               if k != "__step__"})
            ref = _tr.create_state(_tr.TrainConfig())
            like = lambda s, r: np.asarray(s, r.dtype).reshape(r.shape)  # noqa: E731
            st = ref.replace(
                params=jax.tree_util.tree_map(
                    like, tree["params"], jax.device_get(ref.params)),
                batch_stats=jax.tree_util.tree_map(
                    like, tree["batch_stats"],
                    jax.device_get(ref.batch_stats)))
            print(f"bench: using git snapshot step {int(z['__step__'])}",
                  file=sys.stderr)
    if st is not None:
        # device_put ONCE: restore returns host numpy arrays, and
        # passing those to a jitted call re-uploads ~43 MB of params
        # over the tunnel EVERY iteration (~0.9 s/call measured).
        variables = jax.device_put({"params": st.params,
                                    "batch_stats": st.batch_stats})

    # Null-program round-trip: the tunnel's dispatch+fetch latency.
    # Sync numbers include one of these per iteration; the pipelined
    # headline hides it (profiled 2026-08-16: ~30 ms).
    @jax.jit
    def _null(x):
        return x + 1
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(_null(z))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(_null(z))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = sorted(rtts)[len(rtts) // 2] * 1e3

    @jax.jit
    def infer_pipeline(variables, image_bits, carry):
        # carry (uint8 scalar from the previous iteration's output) is
        # XOR-folded into the packed input bits: a genuine data
        # dependency chaining iterations without changing the workload
        # (the unpack path masks each bit individually).
        image_bits = image_bits ^ carry
        images = pipeline.device_unpack_bits(image_bits,
                                             jax.random.PRNGKey(0),
                                             train=False)
        if args.dense:
            preds = model.apply(variables, images, train=False)
            peaks = extract_peaks(preds)
        else:
            # Sparse path (default): wide heads evaluated at peak cells
            # only — see infer/decode.py:extract_peaks_sparse.
            heatmaps, feats = model.apply(
                variables, images, train=False,
                dense_heads=DENSE_HEADS_SPARSE_MODE,
                return_features=True)
            peaks = extract_peaks_sparse(
                heatmaps, feats, variables["params"],
                variables["batch_stats"], DecodeConfig(), jnp.bfloat16)
        # Real runtime-dependent carry (not constant-foldable): low bit
        # of the summed atom scores. XORing it into the packed bytes
        # flips at most the low bit-plane — workload identical.
        new_carry = (peaks["atom_score"].astype(jnp.float32).sum()
                     .astype(jnp.int32) % 2).astype(jnp.uint8)
        return peaks, new_carry

    # Distinct pre-staged input batches (fresh data each iteration) of
    # REAL rendered molecules: forward cost is data-independent, but
    # the trained model on noise pixels emits worst-case junk peaks
    # that make the host-assembly stage (and e2e img/s) unrepresentative.
    import random as _random

    from abcnet_tpu.data.generate import generate_sample

    def _real_batch_bits(seed):
        rng = _random.Random(seed)
        imgs = []
        while len(imgs) < BATCH:
            s = generate_sample(rng)
            if s is not None:
                imgs.append(s.image)
        return pipeline.pack_images(np.stack(imgs), 0.6)

    buffers = [jax.device_put(_real_batch_bits(9000 + s))
               for s in range(N_BUFFERS)]

    def infer_step(buf, carry):
        peaks, new_carry = infer_pipeline(variables, buf, carry)
        return peaks, new_carry

    def block(peaks):
        # Value fetch, not readiness: forces actual execution completion.
        np.asarray(peaks["atom_score"])

    # Warmup (compile + cache).
    c = jnp.uint8(0)
    for b in buffers[:WARMUP]:
        out, c = infer_step(b, c)
    block(out)

    times = _timed_loop(infer_step, buffers, ITERS, block)
    # Median is robust to tunnel hiccups; report mean too.
    med = sorted(times)[len(times) // 2]
    sync_ips = BATCH / med

    # ---- pipelined (double-buffered) throughput: the serving loop ----
    # Compute stays strictly serialized by the carry chain; only the
    # host-side value fetch of iteration i overlaps iteration i+1's
    # device execution. Every output is still fetched inside the timed
    # window, so wall-clock covers all work end to end.
    c = jnp.uint8(0)
    out_prev = None
    t0 = time.perf_counter()
    for i in range(ITERS):
        out, c = infer_step(buffers[i % len(buffers)], c)
        if out_prev is not None:
            block(out_prev)
        out_prev = out
    block(out_prev)
    pipe_dt = time.perf_counter() - t0
    ips = BATCH * ITERS / pipe_dt
    gflops = _program_gflops(infer_pipeline, variables, buffers[0],
                             jnp.uint8(0))
    # Sanity-bound the HEADLINE (pipelined) number against chip peak.
    implied_tflops = ips / BATCH * gflops / 1e3 if gflops else 0.0
    if implied_tflops > TPU_PEAK_TFLOPS:
        raise SystemExit(
            f"bench: implied {implied_tflops:.0f} TFLOP/s exceeds chip "
            f"peak {TPU_PEAK_TFLOPS:.0f} — timing is broken, refusing "
            "to report")

    # ---- host graph assembly to SMILES (the reference's workload ends
    # at SMILES strings, img2smiles2.py:104-317; ours must too) ----
    from abcnet_tpu.infer import assemble_batch
    # Clean-carry dispatch for the assembly stage: the carry XOR flips
    # the low bit-plane of the PACKED bytes, i.e. real pixels (salt
    # noise) — fine for timing the data-independent device program,
    # not for a representative host-assembly peak profile.
    clean_peaks, _ = infer_step(buffers[0], jnp.uint8(0))
    host_peaks = {k: np.asarray(v) for k, v in clean_peaks.items()}
    t0 = time.perf_counter()
    smiles = assemble_batch(host_peaks)
    assemble_dt = time.perf_counter() - t0
    # Two-stage pipeline steady state MODEL: device computes batch i+1
    # while the host assembles batch i — throughput set by the slower
    # stage. Kept as a diagnostic; the measured loop below is the
    # reported number.
    e2e_model_ips = BATCH / max(pipe_dt / ITERS, assemble_dt)

    # MEASURED overlapped e2e with PACKED peak transport: the ~13 peak
    # arrays are concatenated on device into one int32 + one float32
    # buffer (infer/decode.py:pack_peaks), so the download is TWO
    # fetches per batch instead of ~13 — under the tunnel each fetch is
    # a full round trip (~27 ms) and the per-array download alone was
    # 150 img/s worth of serial RTT (logs/bench_r5.log, first run).
    # Batch i+1 is DISPATCHED before batch i is fetched: download and
    # host assembly overlap device execution of the next batch (the C++
    # assembler releases the GIL during ctypes calls).
    from abcnet_tpu.infer.decode import (pack_peaks, peaks_spec,
                                         unpack_peaks_host)
    spec = peaks_spec(host_peaks)

    @jax.jit
    def infer_step_packed(buf, carry):
        peaks, c2 = infer_pipeline(variables, buf, carry)
        ibuf, fbuf = pack_peaks(peaks)
        return ibuf, fbuf, c2

    c = jnp.uint8(0)
    pi, pf, c = infer_step_packed(buffers[0], c)   # warmup/compile
    unpack_peaks_host(pi, pf, spec)

    # A fetch THREAD downloads batch i while the main thread assembles
    # batch i-1 and the device executes batch i+1 (np.asarray blocks in
    # the runtime with the GIL released; the C++ assembler releases the
    # GIL during ctypes calls). Serializing fetch (2 x ~27 ms RTT) with
    # assembly (~39 ms) on one thread capped e2e at ~690 img/s against
    # a ~54 ms/batch device pipeline; overlapped, steady state is
    # max(compute, fetch, assemble). Every batch's values still cross
    # to the host inside the timed window.
    from concurrent.futures import ThreadPoolExecutor

    def _fetch(ib, fb):
        return np.asarray(ib), np.asarray(fb)

    n_ok = 0
    with ThreadPoolExecutor(max_workers=1) as fetcher:
        t0 = time.perf_counter()
        pi, pf, c = infer_step_packed(buffers[0], c)
        fut = fetcher.submit(_fetch, pi, pf)
        for i in range(1, ITERS):
            ni, nf, c = infer_step_packed(buffers[i % len(buffers)], c)
            hi, hf = fut.result()                  # batch i-1 arrives
            fut = fetcher.submit(_fetch, ni, nf)
            host = unpack_peaks_host(hi, hf, spec)
            n_ok += sum(s is not None for s in assemble_batch(host))
        hi, hf = fut.result()
        host = unpack_peaks_host(hi, hf, spec)
        n_ok += sum(s is not None for s in assemble_batch(host))
        e2e_dt = time.perf_counter() - t0
    e2e_ips = BATCH * ITERS / e2e_dt

    # ---- train-step benchmark (fwd+bwd+Adam+targets) ----
    TB = args.train_batch
    train_ips, train_med = 0.0, 0.0
    if not args.skip_train:
        cfg = trainer.TrainConfig(batch_size=TB)
        state = trainer.create_state(cfg)
        tbuffers = [pipeline.synthetic_batch(TB, seed=100 + s)
                    for s in range(2)]
        tbuffers = [jax.device_put(b) for b in tbuffers]
        # Production trainer RNG (hardware rbg; trainer.rng_key docstring
        # has the A/B vs threefry).
        key = trainer.rng_key(0)

        train_times = []
        for i in range(6):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            state, total, losses, mets = trainer.train_step(
                state, tbuffers[i % 2], sub, amount=cfg.amount,
                with_metrics=False)
            float(total)  # value fetch: see note above
            if i >= 2:  # first iterations include compile
                train_times.append(time.perf_counter() - t0)
        train_med = sorted(train_times)[len(train_times) // 2]
        train_ips = TB / train_med

    print(json.dumps({
        "metric": "img2smiles_batch64_inference_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_BASELINE_IPS, 3),
        "sync_ips": round(sync_ips, 2),
        "e2e_smiles_ips": round(e2e_ips, 2),
        "e2e_model_ips": round(e2e_model_ips, 2),
        "e2e_decoded_frac": round(n_ok / (BATCH * ITERS), 4),
        "host_assemble_ms_per_batch": round(assemble_dt * 1e3, 1),
        "decoded_per_batch": sum(s is not None for s in smiles),
        "implied_tflops": round(implied_tflops, 1),
        "program_gflops_per_batch": round(gflops, 1),
        "iter_ms_median": round(med * 1e3, 2),
        "iter_ms_mean": round(sum(times) / len(times) * 1e3, 2),
        "train_step_ips": round(train_ips, 1),
        "train_step_ms": round(train_med * 1e3, 1),
        "train_batch": TB,
        "batch": BATCH,
        "decode_mode": "dense" if args.dense else "sparse",
        "tunnel_rtt_ms": round(rtt_ms, 1),
        "contended_procs": contended,
        "host_cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
