"""Compact git-committable weight snapshots (disaster insurance).

The round-3 production checkpoint (64,150 steps of chip time) lived
only in the gitignored `weights/` directory and was lost to a VM
rebuild at the start of the round-4 chip session — the second time a
restart has eaten ungitted artifacts (train_r2_full.py's docstring
records the first). Orbax checkpoints with Adam moments are ~130 MB
and belong on scratch disk; the *model* itself (10.7M params) is
21 MB in float16 — small enough to live in git.

  save    latest orbax checkpoint in <ckpt_dir>  ->  snapshots/<name>.npz
          (params as float16, batch_stats as float32, step)
  restore snapshots/<name>.npz  ->  <ckpt_dir> as a normal orbax
          checkpoint (fresh Adam moments — the legacy-restore path in
          trainer.restore_checkpoint already handles that) so every
          training/eval script works unchanged.

float16 storage costs at most 2^-11 relative rounding on weights the
forward pass consumes in bfloat16 anyway (bf16 has LESS mantissa).
save() now ENFORCES bf16-path bit-identity per array: any param whose
f16 round-trip would overflow or lose subnormal mantissa bits vs a
direct bf16 cast is stored float32 instead (ADVICE r4).

Usage:
  python scripts/snapshot_weights.py save    [ckpt_dir=weights] [name]
  python scripts/snapshot_weights.py restore <snapshot.npz> [ckpt_dir=weights]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Snapshot IO must never touch the axon tunnel: under a live trainer
# the remote-compile pool blocks until the 600 s subprocess timeout
# (observed at steps 35000/37500, r5 resumed segment — the subprocess
# sat futex-parked with ~0 CPU). When this module is driving a
# CPU-platform process, scrub the remote-compile routing BEFORE jax is
# imported, exactly like the eval chain's CPUENV does.
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _cpu_device():
    # Snapshot IO is host work. Without this pin, create_state's flax
    # init and the orbax restore dispatch to the session's default
    # backend — under the axon tunnel that contends with a live
    # trainer for the chip (observed: the in-training snapshot at
    # step 35000/37500 blew the 600 s subprocess timeout while
    # earlier, uncontended saves took seconds).
    import jax
    return jax.local_devices(backend="cpu")[0]


def save(ckpt_dir: str, name: str) -> str:
    import jax
    from abcnet_tpu.train import trainer
    with jax.default_device(_cpu_device()):
        state = trainer.restore_checkpoint(
            trainer.create_state(trainer.TrainConfig()), ckpt_dir)
    step = int(state.step)
    arrays = {}
    for key, v in _flatten(state.params, "params").items():
        f16 = v.astype(np.float16)
        # f16 is lossy insurance storage: only use it where the
        # round-trip reproduces the bf16 compute path exactly
        # (overflow >65504 -> inf; subnormals <~2^-17 carry fewer
        # mantissa bits in f16 than bf16). Arrays that fail the check
        # are stored f32 — correctness over compactness. ADVICE r4.
        import ml_dtypes
        rt = f16.astype(np.float32).astype(ml_dtypes.bfloat16)
        direct = np.asarray(v, np.float32).astype(ml_dtypes.bfloat16)
        ok = (np.isfinite(f16).all() and
              np.array_equal(rt.view(np.uint16), direct.view(np.uint16)))
        if not ok:
            print(f"  [f16-unsafe] {key}: stored float32", flush=True)
        arrays[key] = f16 if ok else np.asarray(v, np.float32)
    for key, v in _flatten(state.batch_stats, "batch_stats").items():
        arrays[key] = v.astype(np.float32)  # running stats: keep exact
    arrays["__step__"] = np.int64(step)
    out_dir = os.path.join(REPO, "snapshots")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}_step{step}.npz")
    np.savez_compressed(path + ".tmp.npz", **arrays)
    os.replace(path + ".tmp.npz", path)
    print(f"snapshot: {path} ({os.path.getsize(path) / 1e6:.1f} MB, "
          f"step {step})", flush=True)
    return path


def restore(npz_path: str, ckpt_dir: str) -> None:
    import jax
    from abcnet_tpu.train import trainer
    z = np.load(npz_path)
    step = int(z["__step__"])
    flat = {k: z[k] for k in z.files if k != "__step__"}
    tree = _unflatten(flat)
    with jax.default_device(_cpu_device()):
        state = trainer.create_state(trainer.TrainConfig())
    # Cast params back to the dtypes create_state produced (f32 master
    # weights) so optax/orbax trees match exactly.
    import jax

    def _like(snap, ref):
        return jax.tree_util.tree_map(
            lambda s, r: np.asarray(s, dtype=r.dtype).reshape(r.shape),
            snap, jax.device_get(ref))

    state = state.replace(params=_like(tree["params"], state.params),
                          batch_stats=_like(tree["batch_stats"],
                                            state.batch_stats),
                          step=np.int32(step))
    trainer.save_checkpoint(state, ckpt_dir, step)
    print(f"restored {npz_path} -> {ckpt_dir}/step_{step:08d} "
          "(fresh Adam moments)", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    if mode == "save":
        ckpt_dir = sys.argv[2] if len(sys.argv) > 2 else \
            os.path.join(REPO, "weights")
        name = sys.argv[3] if len(sys.argv) > 3 else \
            os.path.basename(os.path.normpath(ckpt_dir))
        save(ckpt_dir, name)
    elif mode == "restore":
        npz_path = sys.argv[2]
        ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else \
            os.path.join(REPO, "weights")
        restore(npz_path, ckpt_dir)
    else:
        raise SystemExit(f"unknown mode {mode!r} (save|restore)")


if __name__ == "__main__":
    main()
