"""Space-to-depth variant: head contract + losslessness of the stem."""

import jax
import jax.numpy as jnp
import numpy as np

from abcnet_tpu.models.unet import PRODUCTION_HEADS, HEAD_NAMES, param_count
from abcnet_tpu.models.unet_s2d import UNetS2D, space_to_depth


def test_space_to_depth_lossless():
    x = jnp.arange(2 * 8 * 8 * 1, dtype=jnp.float32).reshape(2, 8, 8, 1)
    y = space_to_depth(x, 4)
    assert y.shape == (2, 2, 2, 16)
    # Every input element present exactly once.
    np.testing.assert_array_equal(
        np.sort(np.asarray(y).ravel()), np.sort(np.asarray(x).ravel()))
    # Block (0,0) of the image becomes channels of output pixel (0,0).
    np.testing.assert_array_equal(
        np.asarray(y)[0, 0, 0], np.asarray(x)[0, :4, :4, 0].ravel())


def test_s2d_head_contract():
    model = UNetS2D(dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 128, 128, 1)), train=False)
    out = model.apply(variables, jnp.zeros((1, 128, 128, 1)), train=False)
    assert set(out) == set(HEAD_NAMES)
    for name, width in zip(HEAD_NAMES, PRODUCTION_HEADS):
        assert out[name].shape == (1, 32, 32, width)   # stride 4
    n = param_count(variables["params"])
    # Drops the 512^2/256^2 levels' params, keeps everything from the
    # 64-ch level on; must stay in the production model's ballpark.
    assert 9_000_000 < n < 11_000_000, n
