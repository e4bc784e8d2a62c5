"""int8 serving backbone (infer/quant.py).

Gates: (1) BN folding is EXACT against the flax eval forward; (2) the
int8 path compiles, keeps the sparse-serving contract, and tracks the
float outputs closely on a binary-ink input. Accuracy on trained
weights is gated end-to-end by scripts/quant_eval.py (CBAM protocol:
adopt or retire with numbers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abcnet_tpu.infer import quant
from abcnet_tpu.models import create_unet, init_unet


@pytest.fixture(scope="module")
def setup():
    model = create_unet()
    variables = init_unet(jax.random.PRNGKey(0), model,
                          input_shape=(1, 64, 64, 1))
    x = (jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 1))
         < 0.1).astype(jnp.float32)
    F = quant.fold_eval_params(variables)
    return model, variables, x, F


def test_fold_exact_vs_flax(setup):
    model, variables, x, F = setup
    ref_out, ref_y = model.apply(
        variables, x, train=False,
        dense_heads=("atom_target", "bond_target"), return_features=True)
    out, y = quant.forward_folded(F, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               atol=1e-5)
    for h in ref_out:
        np.testing.assert_allclose(np.asarray(out[h]),
                                   np.asarray(ref_out[h]), atol=1e-5)


def test_int8_contract_and_fidelity(setup):
    model, variables, x, F = setup
    amax = quant.calibrate(F, np.asarray(x))
    Q = quant.quantize_folded(F, amax)
    qout, qy = jax.jit(quant.forward_quant)(Q, x)
    ref_out, ref_y = quant.forward_folded(F, x)
    assert qy.shape == ref_y.shape and qy.dtype == jnp.bfloat16
    for h in ref_out:
        assert qout[h].shape == ref_out[h].shape
        a = np.asarray(qout[h], np.float32).ravel()
        b = np.asarray(ref_out[h], np.float32).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.97, (h, corr)


def test_weights_are_int8(setup):
    _, _, x, F = setup
    Q = quant.quantize_folded(F, quant.calibrate(F, np.asarray(x)))
    assert Q["inc1"][0][0].dtype == jnp.int8
    assert Q["up1"]["t"][0].dtype == jnp.int8
    assert Q["heads"]["atom_target"]["c3"][0].dtype == jnp.int8
    # Input-site scale is the exact binary-mask scale, not calibrated.
    assert abs(Q["scales"]["in"] - 1.0 / 127.0) < 1e-12
