"""Model shape and parameter-count parity tests.

The reference production model has 10,698,575 parameters (verified by
instantiation per SURVEY.md section 2.3) and emits 8 stride-4 heads of
widths (1,14,3,2,1,360,60,60)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abcnet_tpu.models import (HEAD_NAMES, PRODUCTION_HEADS, create_unet,
                               init_unet, param_count)


@pytest.fixture(scope="module")
def model_and_vars():
    model = create_unet()
    variables = init_unet(jax.random.PRNGKey(0), model,
                          input_shape=(1, 128, 128, 1))
    return model, variables


def test_param_count_parity(model_and_vars):
    _, variables = model_and_vars
    n = param_count(variables["params"])
    assert n == 10_698_575, f"got {n}"


def test_head_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 128, 128, 1))
    out = model.apply(variables, x, train=False)
    assert set(out.keys()) == set(HEAD_NAMES)
    for name, width in zip(HEAD_NAMES, PRODUCTION_HEADS):
        # stride 4: 128 -> 32
        assert out[name].shape == (2, 32, 32, width), name


@pytest.mark.slow
def test_full_resolution_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((1, 512, 512, 1))
    out = model.apply(variables, x, train=False)
    assert out["atom_target"].shape == (1, 128, 128, 1)
    assert out["bond_type"].shape == (1, 128, 128, 360)


def test_train_mode_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    x = jnp.ones((2, 128, 128, 1))
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    # Batch stats must actually change from their init values.
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(before, after)]
    assert max(diffs) > 0


def test_bf16_compute_path():
    model = create_unet(dtype=jnp.bfloat16)
    variables = init_unet(jax.random.PRNGKey(0), model,
                          input_shape=(1, 128, 128, 1))
    x = jnp.ones((1, 128, 128, 1))
    out = model.apply(variables, x, train=False)
    # Heads keep the compute dtype (consumers upcast after gathers —
    # an f32 cast here would double the wide heads' HBM footprint).
    assert out["atom_target"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out["atom_target"],
                                  dtype=np.float32)).all()


def test_cbam_unet_param_count():
    """11,177,340 params — parity with reference unet2.py at production
    heads (verified by instantiating the torch reference)."""
    import jax
    from abcnet_tpu.models.unet import init_unet, param_count
    from abcnet_tpu.models.unet_cbam import UNetCBAM
    model = UNetCBAM()
    v = init_unet(jax.random.PRNGKey(0), model, (1, 64, 64, 1))
    assert param_count(v["params"]) == 11_177_340
