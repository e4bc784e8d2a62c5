"""Trainer tests on the virtual 8-device CPU mesh (tiny 128x128 shapes).

The reference could only exercise its distributed path on real GPUs
(hardcoded NCCL rendezvous, multi_gpu_train.py:44); here the full SPMD
train step — device preprocess, scatter targets, forward/backward,
Adam update, metric pairs — compiles and runs on a faked 8-device mesh.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from abcnet_tpu.data import pipeline
from abcnet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from abcnet_tpu.train import trainer


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = trainer.TrainConfig(batch_size=8, epochs=3, dtype="float32")
    mesh = make_mesh(8)
    state = replicate_tree(trainer.create_state(cfg), mesh)
    host = pipeline.synthetic_batch(8, seed=0, size=128)
    batch = shard_batch(host, mesh)
    return cfg, mesh, state, batch


def test_train_step_runs_and_decreases_loss(tiny_setup):
    cfg, mesh, state, batch = tiny_setup
    # train_step donates its state argument; work on a copy so the
    # module-scoped fixture state survives for the other tests.
    state = jax.tree_util.tree_map(jnp.array, state)
    key = jax.random.PRNGKey(0)
    totals = []
    for i in range(4):
        key, sub = jax.random.split(key)
        state, total, losses, mets = trainer.train_step(
            state, batch, sub, amount=cfg.amount)
        totals.append(float(total))
    assert all(np.isfinite(t) for t in totals)
    assert totals[-1] < totals[0]
    assert int(state.step) == 4


def test_eval_step_metrics(tiny_setup):
    cfg, mesh, state, batch = tiny_setup
    total, losses, mets = trainer.eval_step(state, batch,
                                            jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    assert "bond_types_acc" in mets          # dense eval-only metric
    for name, (num, den) in mets.items():
        assert np.isfinite(float(num)), name


def test_set_learning_rate(tiny_setup):
    cfg, mesh, state, batch = tiny_setup
    state2 = trainer.set_learning_rate(state, 2.5e-5)
    lr = float(state2.opt_state[2].hyperparams["learning_rate"])
    assert abs(lr - 2.5e-5) < 1e-12


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    cfg, mesh, state, batch = tiny_setup
    trainer.save_checkpoint(state, str(tmp_path), 7)
    blank = trainer.create_state(cfg)
    restored = trainer.restore_checkpoint(blank, str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(restored.params["s"]), np.asarray(state.params["s"]))
    leaves_a = jax.tree_util.tree_leaves(restored.params)
    leaves_b = jax.tree_util.tree_leaves(state.params)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_restores_opt_state(tiny_setup, tmp_path):
    """Resume must continue with identical Adam moments + injected LR
    (ADVICE r1: a resume used to silently reset moments and train at
    full LR past the drop point)."""
    cfg, mesh, state, batch = tiny_setup
    state = jax.tree_util.tree_map(jnp.array, state)
    key = jax.random.PRNGKey(3)
    for _ in range(2):  # non-trivial mu/nu
        key, sub = jax.random.split(key)
        state, *_ = trainer.train_step(state, batch, sub,
                                       amount=cfg.amount,
                                       with_metrics=False)
    state = trainer.set_learning_rate(state, 1.25e-5)
    trainer.save_checkpoint(state, str(tmp_path), int(state.step))
    restored = trainer.restore_checkpoint(trainer.create_state(cfg),
                                          str(tmp_path))
    la = jax.tree_util.tree_leaves(restored.opt_state)
    lb = jax.tree_util.tree_leaves(state.opt_state)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    lr = float(restored.opt_state[2].hyperparams["learning_rate"])
    assert abs(lr - 1.25e-5) < 1e-12
    assert int(restored.step) == int(state.step)


def test_train_step_scan_matches_unrolled(tiny_setup):
    """train_step_scan's split/scan/accumulate plumbing must reproduce
    the unrolled two-microbatch computation (same rng splits, same
    interleaved split, BN stats carried sequentially).

    The comparison runs on an SGD(1.0) state so params_after - params
    == -mean(grads): the scan and the unrolled loop compile to
    different XLA schedules, and Adam's first step amplifies
    reduction-order noise near |g|~0 to O(lr) sign flips, which made a
    post-Adam params comparison meaningless."""
    import optax

    cfg, mesh, state, batch = tiny_setup
    rng = jax.random.PRNGKey(7)

    sgd = optax.sgd(1.0)
    state = state.replace(tx=sgd, opt_state=sgd.init(state.params))

    s1 = jax.tree_util.tree_map(jnp.array, state)
    s1, total_scan, losses_scan, _ = trainer.train_step_scan(
        s1, batch, rng, amount=cfg.amount, n_micro=2)

    # Unrolled reference: identical math outside lax.scan (jitted as one
    # program — eager conv dispatch aborts on the virtual-device CPU).
    @jax.jit
    def unrolled(state, batch, rng):
        micro = trainer._interleave_split(dict(batch), 2)
        rngs = jax.random.split(rng, 2)
        gfn = jax.value_and_grad(trainer.loss_and_metrics, has_aux=True)
        bstats = state.batch_stats
        gsum, tsum = None, 0.0
        for i in range(2):
            mb = {k: v[i] for k, v in micro.items()}
            (t, aux), g = gfn(state.params, bstats, state.apply_fn, mb,
                              rngs[i], cfg.amount, True, False)
            bstats = aux["batch_stats"]
            gsum = g if gsum is None else jax.tree_util.tree_map(
                jnp.add, gsum, g)
            tsum = tsum + t
        grads = jax.tree_util.tree_map(lambda x: x * 0.5, gsum)
        updates, _ = state.tx.update(grads, state.opt_state, state.params)
        return optax.apply_updates(state.params, updates), bstats, tsum

    params_ref, bstats, tsum = unrolled(state, batch, rng)

    np.testing.assert_allclose(float(total_scan), float(tsum) * 0.5,
                               rtol=1e-4)
    # params - params_ref = grad_ref_mean - grad_scan_mean: pure
    # accumulation plumbing. atol 1e-4: the conv biases feed BatchNorm,
    # so their analytic gradient is ~0 and the numeric one is pure
    # catastrophic-cancellation residue (~1e-5 measured) that differs
    # at 100% relative between the scan and unrolled schedules; a real
    # plumbing bug (swapped rng, missing 1/n) shows up at O(1e-2).
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(bstats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_unet_remat_param_parity():
    """remat_blocks must not change the param tree or the forward
    values — lifted checkpointing is name- and math-transparent, so
    production checkpoints load into a rematted model unchanged."""
    from abcnet_tpu.models.unet import UNet, init_unet

    base = UNet(dtype=jnp.float32)
    rem = UNet(dtype=jnp.float32,
               remat_blocks=("inc1", "inc2", "down1", "up3", "dconv1",
                             "heads"))
    rng = jax.random.PRNGKey(0)
    v0 = init_unet(rng, base, input_shape=(1, 128, 128, 1))
    v1 = init_unet(rng, rem, input_shape=(1, 128, 128, 1))
    p0 = jax.tree_util.tree_structure(v0["params"])
    p1 = jax.tree_util.tree_structure(v1["params"])
    assert p0 == p1
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 128, 128, 1)), jnp.float32)
    o0 = base.apply(v0, x, train=False)
    o1 = rem.apply(v0, x, train=False)   # base params into rematted model
    for k in o0:
        np.testing.assert_allclose(np.asarray(o0[k]), np.asarray(o1[k]),
                                   rtol=1e-6, atol=1e-6)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_mesh_sharded_inference(tiny_setup):
    """Batched inference sharded over the 8-device mesh — parity role of
    multi_proc_img2smiles2.py's DataParallel forward."""
    from abcnet_tpu.infer.decode import make_infer_pipeline
    cfg, mesh, state, batch = tiny_setup
    run = make_infer_pipeline(state, mesh)
    imgs = np.random.default_rng(0).integers(
        0, 256, (8, 128, 128), dtype=np.uint8)
    peaks = run(imgs)
    assert peaks["atom_xy"].shape[0] == 8
    # The async dispatch/fetch split (the overlapped serving loop's
    # primitive) must be bit-identical to the one-shot run().
    split = run.fetch(run.dispatch(imgs))
    assert set(split) == set(peaks)
    for k in peaks:
        np.testing.assert_array_equal(np.asarray(split[k]),
                                      np.asarray(peaks[k]), err_msg=k)
    # And safe from a worker thread (the production loop fetches there).
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(1) as ex:
        threaded = ex.submit(run.fetch, run.dispatch(imgs)).result()
    np.testing.assert_array_equal(np.asarray(threaded["atom_xy"]),
                                  np.asarray(peaks["atom_xy"]))
