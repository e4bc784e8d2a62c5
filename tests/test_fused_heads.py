"""Fused head-bank equivalence (scripts/roofline.py lever).

UNet(fused_head_bank=True) must be the SAME function as the production
per-head model under checkpoint conversion — fusion is a schedule
change (one 128->1024 conv + one 1024-ch BN instead of 8 re-reads of
the trunk), not a semantic one. Reference head contract:
/root/reference/src/unet.py:63-74,96-119."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abcnet_tpu.models import create_unet, init_unet, param_count
from abcnet_tpu.models.fuse_heads import (fuse_head_variables,
                                          unfuse_head_variables)
from abcnet_tpu.models.unet import HEAD_NAMES, PRODUCTION_HEADS, UNet


@pytest.fixture(scope="module")
def prod_vars():
    model = create_unet()
    variables = init_unet(jax.random.PRNGKey(7), model,
                          input_shape=(1, 64, 64, 1))
    return model, variables


def test_param_count_preserved(prod_vars):
    _, variables = prod_vars
    fused = fuse_head_variables(variables)
    assert param_count(fused["params"]) == param_count(
        variables["params"]) == 10_698_575


def test_eval_equivalence_prod_to_fused(prod_vars):
    model, variables = prod_vars
    fused_model = UNet(fused_head_bank=True)
    fused = fuse_head_variables(variables)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 1))
    out_a = model.apply(variables, x, train=False)
    out_b = fused_model.apply(fused, x, train=False)
    assert set(out_a) == set(out_b) == set(HEAD_NAMES)
    for name in HEAD_NAMES:
        np.testing.assert_allclose(np.asarray(out_a[name]),
                                   np.asarray(out_b[name]),
                                   rtol=1e-5, atol=1e-5)


def test_roundtrip_exact(prod_vars):
    _, variables = prod_vars
    back = unfuse_head_variables(fuse_head_variables(variables))
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    paths_a = {jax.tree_util.keystr(p): v for p, v in flat_a}
    paths_b = {jax.tree_util.keystr(p): v for p, v in flat_b}
    assert set(paths_a) == set(paths_b)
    for k, v in paths_a.items():
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(paths_b[k]), err_msg=k)


def test_fused_train_mode_runs(prod_vars):
    """BN batch-stats + dropout wiring under the fused bank."""
    _, variables = prod_vars
    fused_model = UNet(fused_head_bank=True)
    fused = fuse_head_variables(variables)
    x = jnp.ones((2, 64, 64, 1))
    out, mutated = fused_model.apply(
        fused, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["bond_type"].shape == (2, 16, 16, 360)
    assert "head_bank_bn" in mutated["batch_stats"]


def test_fused_bn_train_stats_match_per_head(prod_vars):
    """One 1024-ch BN == 8 per-head 128-ch BNs: the batch statistics the
    train pass computes must be identical slice-for-slice."""
    model, variables = prod_vars
    fused_model = UNet(fused_head_bank=True)
    fused = fuse_head_variables(variables)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 1))
    _, mut_a = model.apply(variables, x, train=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(0)})
    _, mut_b = fused_model.apply(fused, x, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(0)})
    per_head = jnp.concatenate(
        [mut_a["batch_stats"][f"out_{n}"]["BatchNorm_0"]["mean"]
         for n in HEAD_NAMES], axis=-1)
    np.testing.assert_allclose(
        np.asarray(per_head),
        np.asarray(mut_b["batch_stats"]["head_bank_bn"]["mean"]),
        rtol=1e-5, atol=1e-6)
