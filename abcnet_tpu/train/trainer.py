"""Data-parallel training: one jitted SPMD step, orbax checkpoints.

Semantics parity with the reference training loop
(/root/reference/src/train.py:44-141, src/multi_gpu_train2.py):
  * Adam lr 2.5e-4, weight_decay 1e-8 (L2-into-grad, torch style),
    dropped to 2.5e-5 at epoch floor(epochs/3) (train.py:55,83-85 —
    the reference re-creates the optimizer there, resetting Adam
    moments; we keep moments and only drop the LR, documented
    divergence in the reference's favor of stability)
  * batch 64, the eight uncertainty-weighted focal/L1 losses
  * metric suite accumulated and printed every `log_every` steps,
    full test-split eval every `eval_every` steps (train.py:217-433)
  * per-epoch checkpointing (train.py:435) — orbax, with resume

TPU-first structure: the entire step — uint8 -> binarize/noise,
scatter-built targets, forward, loss, backward, Adam update, metric
(num, den) pairs — is ONE compiled XLA program over the mesh. Host code
only feeds uint8 batches and fetches accumulated scalars.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data import pipeline, vocab
from ..models.unet import UNet, PRODUCTION_HEADS, init_unet
from ..ops import losses as L
from ..ops.targets import build_targets
from ..parallel import make_mesh, shard_batch, replicate_tree
from . import metrics as M


@dataclass
class TrainConfig:
    heads: Tuple[int, ...] = PRODUCTION_HEADS
    batch_size: int = 64
    lr: float = 2.5e-4
    weight_decay: float = 1e-8
    epochs: int = 30
    lr_drop_factor: float = 0.1
    amount: float = 0.2          # noise amount (utils.py:73-80)
    dtype: str = "bfloat16"      # compute dtype; params/BN stats f32
    seed: int = 0
    log_every: int = 100
    eval_every: int = 100
    # Train metrics are sampled every k-th step (the NMS metric suite
    # costs real step time; the reference computes it every step).
    metrics_every: int = 5
    # Eval materializes the dense (6,60,G,G) bond_type target per sample
    # (~24 MB f32); a smaller eval batch keeps HBM headroom.
    eval_batch_size: int = 16
    ckpt_dir: Optional[str] = None
    n_devices: Optional[int] = None

    @property
    def lr_drop_epoch(self) -> int:
        return int(self.epochs / 3)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def rng_key(seed: int) -> jax.Array:
    """Typed PRNG key on the TPU's hardware RBG implementation.

    The per-step key feeds the (B,512,512) salt/pepper noise masks
    (pipeline.device_unpack_bits) and the head dropout; with the default
    threefry impl that bit generation is pure VPU work inside the step.
    Measured on v5e at batch 128: 666 ms/step with rbg vs 780 ms with
    threefry (~15% step time). rbg trades counter-based reproducibility
    across backends for speed — fine here, the reference's torch RNG has
    no cross-run guarantee either (utils.py:47-77 uses np global RNG).
    """
    return jax.random.key(seed, impl="rbg")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """torch-style Adam: wd added to the gradient before moments
    (train.py:55), LR dropped once at epoch floor(epochs/3)."""
    def schedule(step):
        del step
        return 1.0  # scale handled via inject_hyperparams lr below
    del schedule
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.inject_hyperparams(optax.scale_by_adam)(),
        optax.inject_hyperparams(lambda learning_rate: optax.scale(
            -learning_rate))(learning_rate=cfg.lr),
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side LR update between epochs (the schedule is epoch-indexed
    and data-size-dependent, so it lives outside the compiled step)."""
    opt_state = list(state.opt_state)
    scale_state = opt_state[2]
    hyper = dict(scale_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    opt_state[2] = scale_state._replace(hyperparams=hyper)
    return state.replace(opt_state=tuple(opt_state))


def create_state(cfg: TrainConfig, rng: Optional[jax.Array] = None,
                 model=None) -> TrainState:
    """model: optional flax module overriding the production UNet (same
    head I/O contract) — e.g. models.unet_cbam.UNetCBAM (the
    reference's never-trained src/unet2.py variant)."""
    if model is None:
        model = UNet(heads=tuple(cfg.heads), dtype=getattr(jnp, cfg.dtype))
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    variables = init_unet(rng, model)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params), tx=tx,
                      apply_fn=model.apply)


def loss_and_metrics(params, batch_stats, apply_fn, batch, rng,
                     amount: float, train: bool,
                     with_metrics: bool = True,
                     use_pallas_input: bool = False):
    """Single fused forward: preprocess -> targets -> model -> losses.

    use_pallas_input routes preprocessing through the fused Pallas
    kernel (ops/pallas_input.py) — opt-in, adopted only if the chip A/B
    (scripts/pallas_input_ab.py) shows a win."""
    if "image_bits" in batch:
        images = pipeline.device_unpack_bits(batch["image_bits"], rng,
                                             amount=amount, train=train,
                                             use_pallas=use_pallas_input)
    else:
        images = pipeline.device_preprocess(batch["image_u8"], rng,
                                            amount=amount, train=train)
    grid = images.shape[1] // vocab.STRIDE
    targets = build_targets(batch, with_full_type=not train, grid=grid)

    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        preds, mutated = apply_fn(variables, images, train=True,
                                  mutable=["batch_stats"],
                                  rngs={"dropout": rng})
        new_stats = mutated["batch_stats"]
    else:
        preds = apply_fn(variables, images, train=False)
        new_stats = batch_stats

    losses = L.compute_losses(preds, targets, batch,
                              fused_bond_type=train)
    total = L.total_loss(losses, params["s"])
    aux = {"losses": losses, "batch_stats": new_stats}
    if with_metrics:
        aux["metrics"] = M.compute_metrics(preds, L._to_nhwc_targets(targets))
    return total, aux


@functools.partial(jax.jit,
                   static_argnames=("amount", "with_metrics",
                                    "use_pallas_input"),
                   donate_argnums=(0,))
def train_step(state: TrainState, batch, rng, amount: float = 0.2,
               with_metrics: bool = True,
               use_pallas_input: bool = False):
    """One SPMD training step. with_metrics=False skips the NMS metric
    suite (a per-step cost the reference always pays, train.py:143-215);
    callers may sample metrics every k-th step instead."""
    grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
    (total, aux), grads = grad_fn(state.params, state.batch_stats,
                                  state.apply_fn, batch, rng, amount,
                                  True, with_metrics, use_pallas_input)
    updates, opt_state = state.tx.update(grads, state.opt_state,
                                         state.params)
    params = optax.apply_updates(state.params, updates)
    state = state.replace(step=state.step + 1, params=params,
                          batch_stats=aux["batch_stats"],
                          opt_state=opt_state)
    return state, total, aux["losses"], aux.get("metrics", {})


def _interleave_split(batch: Dict[str, jnp.ndarray], n_micro: int):
    """Split a batch into n_micro microbatches along axis 0, interleaved
    (microbatch i takes elements i, i+n, i+2n, ...). Interleaving keeps
    each microbatch spread evenly over a data-sharded axis: with B
    sharded d-ways, every device contributes B/(d*n) elements to every
    microbatch, so the reshape stays shard-local (a contiguous split
    would put microbatch 0 entirely on the first d/n devices)."""
    def split(v):
        b = v.shape[0]
        return v.reshape(b // n_micro, n_micro, *v.shape[1:]).swapaxes(0, 1)
    return {k: split(v) for k, v in batch.items()}


@functools.partial(jax.jit, static_argnames=("amount", "n_micro"),
                   donate_argnums=(0,))
def train_step_scan(state: TrainState, batch, rng, amount: float = 0.2,
                    n_micro: int = 2):
    """train_step at effective batch B as a lax.scan over n_micro
    microbatches of B/n_micro, one Adam update (VERDICT r4 #6).

    The round-4 lever table measured why this exists: jitting two
    back-to-back microbatches (mfu_levers.py accum2) keeps BOTH
    activation sets live and OOMs the 15.75 GB HBM at effective batch
    256 (28.3 GB). A lax.scan body is compiled once and its
    activations die at each iteration boundary, so activation memory
    is that of ONE microbatch while the optimizer still sees the
    full-batch mean gradient.

    Semantics vs train_step(B): the update is the mean over the
    n_micro microbatch gradients. BatchNorm normalizes per microbatch
    (stats over B/n_micro samples) — with B/n_micro = 64 this is
    exactly the reference's single-GPU batch-64 BN (train.py:44), and
    the per-microbatch running-stat updates are the statistics stream
    torch DDP produces on n_micro workers. Dropout/noise keys are
    split per microbatch. The scan/split/accumulate plumbing is tested
    against an unrolled two-pass reference
    (tests/test_trainer.py::test_train_step_scan_matches_unrolled).
    """
    micro = _interleave_split(batch, n_micro)
    rngs = jax.random.split(rng, n_micro)
    gfn = jax.value_and_grad(loss_and_metrics, has_aux=True)

    def body(carry, xs):
        bstats, gsum, tsum = carry
        mb, r = xs
        (total, aux), g = gfn(state.params, bstats, state.apply_fn, mb,
                              r, amount, True, False)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        return (aux["batch_stats"], gsum, tsum + total), aux["losses"]

    gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    (bstats, gsum, tsum), losses = jax.lax.scan(
        body, (state.batch_stats, gzero, jnp.zeros((), jnp.float32)),
        (micro, rngs))
    inv = 1.0 / n_micro
    grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
    updates, opt_state = state.tx.update(grads, state.opt_state,
                                         state.params)
    params = optax.apply_updates(state.params, updates)
    state = state.replace(step=state.step + 1, params=params,
                          batch_stats=bstats, opt_state=opt_state)
    losses = jax.tree_util.tree_map(lambda x: x.mean(), losses)
    return state, tsum * inv, losses, {}


@functools.partial(jax.jit, static_argnames=("amount",))
def train_metrics_step(state: TrainState, batch, rng,
                       amount: float = 0.2):
    """Detection metrics on the TRAINING batch under eval-mode forward
    semantics (running BN stats, no dropout).

    The reference computes its train metrics on the train-mode forward
    (train.py:145-162), which is meaningful for torch at its operating
    point; here train-mode BN batch-stats + dropout suppress atom peaks
    below the 0.25 threshold, quantizing precision to n/tiny-count
    (round-2 logs: aP in {0.0, 0.5, 1.0} while eval reads 0.8955). Same
    rng => identical augmented images as the paired train step; only the
    forward mode differs, so the logged numbers track eval."""
    if "image_bits" in batch:
        images = pipeline.device_unpack_bits(batch["image_bits"], rng,
                                             amount=amount, train=True)
    else:
        images = pipeline.device_preprocess(batch["image_u8"], rng,
                                            amount=amount, train=True)
    grid = images.shape[1] // vocab.STRIDE
    targets = build_targets(batch, with_full_type=False, grid=grid)
    preds = state.apply_fn({"params": state.params,
                            "batch_stats": state.batch_stats},
                           images, train=False)
    return M.compute_metrics(preds, L._to_nhwc_targets(targets))


@jax.jit
def eval_step(state: TrainState, batch, rng):
    total, aux = loss_and_metrics(state.params, state.batch_stats,
                                  state.apply_fn, batch, rng,
                                  0.0, False)
    return total, aux["losses"], aux["metrics"]


@jax.jit
def predict_step(state: TrainState, images):
    """Inference forward on preprocessed float images (B, H, W, 1)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return state.apply_fn(variables, images, train=False)


# ---------------------------------------------------------------------------
# Checkpointing (orbax) — reference saves state_dict per epoch
# (train.py:435); we save params/batch_stats/opt_state/step with resume.
# ---------------------------------------------------------------------------

def save_checkpoint(state: TrainState, ckpt_dir: str, step: int) -> None:
    """Persist params/batch_stats/step AND the full optimizer state.

    opt_state is saved as a flat leaf list (Adam mu/nu, counts, injected
    learning_rate) so resume continues with identical moments and LR —
    the reference loses both across restarts (train.py:53 is a
    commented-out load_state_dict with no optimizer state).
    """
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    opt_leaves = [np.asarray(x) for x in
                  jax.device_get(jax.tree_util.tree_leaves(state.opt_state))]
    ckptr.save(path, {"params": jax.device_get(state.params),
                      "batch_stats": jax.device_get(state.batch_stats),
                      "step": int(state.step),
                      "opt_leaves": opt_leaves})
    ckptr.wait_until_finished()


def restore_checkpoint(state: TrainState, ckpt_dir: str,
                       step: Optional[int] = None) -> TrainState:
    """Restore the latest (or given-step) checkpoint into `state`.

    Checkpoints written before opt_state was persisted restore with
    fresh optimizer moments (a warning is printed); new ones resume
    bit-exact including the injected learning_rate.
    """
    import orbax.checkpoint as ocp
    root = os.path.abspath(ckpt_dir)
    if step is None:
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(root)
                       if d.startswith("step_"))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {root}")
        step = steps[-1]
    path = os.path.join(root, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    opt_leaves, opt_treedef = jax.tree_util.tree_flatten(state.opt_state)
    target = {"params": jax.device_get(state.params),
              "batch_stats": jax.device_get(state.batch_stats),
              "step": 0,
              "opt_leaves": [np.asarray(x) for x in
                             jax.device_get(opt_leaves)]}
    try:
        restored = ckptr.restore(path, target)
        opt_state = jax.tree_util.tree_unflatten(
            opt_treedef, restored["opt_leaves"])
    except BaseException:  # legacy checkpoint without opt_leaves
        del target["opt_leaves"]
        restored = ckptr.restore(path, target)
        opt_state = state.opt_state
        print(f"[ckpt] {path}: no optimizer state (legacy); "
              "Adam moments start fresh", flush=True)
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=opt_state,
                         step=jnp.asarray(restored["step"], jnp.int32))


# ---------------------------------------------------------------------------
# Fit loop
# ---------------------------------------------------------------------------

def fit(cfg: TrainConfig, train_examples, test_examples=None,
        state: Optional[TrainState] = None, verbose: bool = True,
        mesh=None) -> TrainState:
    """Train over in-memory data (see data/pipeline.py for sources).

    train_examples may be raw Samples — then every epoch re-augments
    them (the reference's dataloader re-runs __getitem__ per epoch,
    utils.py:47-61) — or pre-built Examples (fixed augmentation)."""
    from ..data.generate import Sample
    samples_mode = bool(train_examples) and isinstance(
        train_examples[0], Sample)
    mesh = mesh or make_mesh(cfg.n_devices)
    if state is None:
        state = create_state(cfg)
    state = replicate_tree(state, mesh)

    key = jax.random.PRNGKey(cfg.seed + 1)
    meters = M.MeterBank()
    t0 = time.time()
    imgs_done = 0

    # Resume-aware epoch bookkeeping: the step lives on device; track it
    # on host to avoid a per-step device->host sync (the reference's
    # per-step `.cpu().numpy()` fetches are its throughput killer,
    # train.py:145-215 — we must not reintroduce one via int(state.step)).
    step = int(state.step)
    steps_per_epoch = max(len(train_examples) // cfg.batch_size, 1)
    start_epoch = min(step // steps_per_epoch, cfg.epochs)

    for epoch in range(start_epoch, cfg.epochs):
        if epoch >= cfg.lr_drop_epoch:
            # >= not ==: a resume past the drop point must not silently
            # train at full LR again (the saved opt_state also carries
            # the LR, but legacy checkpoints don't).
            state = set_learning_rate(state, cfg.lr * cfg.lr_drop_factor)
        if samples_mode:
            it = pipeline.batches_from_samples(
                train_examples, cfg.batch_size, seed=cfg.seed,
                epoch=epoch, train=True)
        else:
            it = pipeline.batches_from_examples(
                train_examples, cfg.batch_size, seed=cfg.seed + epoch)
        for i, host_batch in enumerate(pipeline.PrefetchIterator(it)):
            batch = shard_batch(host_batch, mesh)
            key, sub = jax.random.split(key)
            with_m = step % cfg.metrics_every == 0
            state, total, losses, _ = train_step(state, batch, sub,
                                                 amount=cfg.amount,
                                                 with_metrics=False)
            if with_m:
                # Eval-mode forward on the same augmented batch (see
                # train_metrics_step) — post-update params, like the
                # reference's post-step metric reads.
                meters.update(train_metrics_step(state, batch, sub,
                                                 amount=cfg.amount))
            imgs_done += cfg.batch_size
            step += 1
            if verbose and step % cfg.log_every == 0:
                avg = meters.averages()
                ips = imgs_done / (time.time() - t0)
                print(f"epoch {epoch} step {step} "
                      f"loss {float(total):.4f} ips {ips:.1f} "
                      + " ".join(f"{k}={v:.4f}" for k, v in
                                 sorted(avg.items())))
                meters.reset()
            if test_examples and step % cfg.eval_every == 0:
                evaluate(state, test_examples, cfg, mesh, key,
                         verbose=verbose)
        if cfg.ckpt_dir:
            save_checkpoint(state, cfg.ckpt_dir, int(state.step))
    return state


def evaluate(state: TrainState, examples, cfg: TrainConfig, mesh=None,
             key=None, verbose: bool = True) -> Dict[str, float]:
    mesh = mesh or make_mesh(cfg.n_devices)
    key = key if key is not None else jax.random.PRNGKey(0)
    meters = M.MeterBank()
    total_sum, nb = 0.0, 0
    for host_batch in pipeline.batches_from_examples(
            examples, cfg.eval_batch_size, shuffle=False,
            drop_remainder=True):
        batch = shard_batch(host_batch, mesh)
        key, sub = jax.random.split(key)
        total, losses, mets = eval_step(state, batch, sub)
        meters.update(mets)
        total_sum += float(total)
        nb += 1
    avg = meters.averages()
    if verbose:
        print("eval  loss {:.4f} ".format(total_sum / max(nb, 1))
              + " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items())))
    return avg
