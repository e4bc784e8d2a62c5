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
