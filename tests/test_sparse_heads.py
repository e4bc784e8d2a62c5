"""Sparse head evaluation (infer/decode.py) vs the dense path.

The sparse inference path evaluates the six classification/regression
heads only at peak cells by gathering 3x3 trunk-feature windows and
applying the OutConv math per cell. These tests pin:

  * apply_head_sparse == the dense OutConv map at arbitrary cells,
    including map borders (SAME zero padding);
  * extract_peaks_sparse decodes the same graphs as extract_peaks on a
    randomly initialized model (argmax classes, peak coordinates, bond
    bins/types/deltas).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abcnet_tpu.infer import decode
from abcnet_tpu.models.unet import UNet, init_unet


@pytest.fixture(scope="module")
def small_model():
    model = UNet(dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    variables = init_unet(rng, model, input_shape=(1, 128, 128, 1))
    return model, variables


def _forward_both(model, variables, x):
    dense = model.apply(variables, x, train=False)
    heatmaps, feats = model.apply(
        variables, x, train=False,
        dense_heads=decode.DENSE_HEADS_SPARSE_MODE, return_features=True)
    return dense, heatmaps, feats


def test_dense_subset_matches_full(small_model):
    model, variables = small_model
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 1))
    dense, heatmaps, feats = _forward_both(model, variables, x)
    np.testing.assert_allclose(np.asarray(dense["atom_target"]),
                               np.asarray(heatmaps["atom_target"]),
                               rtol=0, atol=0)
    assert feats.shape == (2, 32, 32, 128)


def test_apply_head_sparse_matches_dense_map(small_model):
    model, variables = small_model
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 1))
    dense, _, feats = _forward_both(model, variables, x)
    # Interior cells plus all four corners / edges (zero-pad semantics).
    xs = jnp.asarray([[0, 0, 31, 31, 5, 16, 30], [1, 0, 31, 7, 13, 0, 31]])
    ys = jnp.asarray([[0, 31, 0, 31, 9, 16, 1], [3, 5, 31, 0, 21, 31, 16]])
    win = decode.gather_windows(feats, xs, ys, 1)
    for head in ("atom_type", "bond_omega", "bond_type", "bond_rho"):
        sparse = decode.apply_head_sparse(
            variables["params"][f"out_{head}"],
            variables["batch_stats"][f"out_{head}"], win, jnp.float32)
        b_idx = jnp.arange(2)[:, None]
        ref = dense[head][b_idx, xs, ys]
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_fused_heads_match_per_head(small_model):
    """apply_heads_fused (the production path — and the workaround for
    the axon backend's bf16 small-einsum miscompile) == per-head
    apply_head_sparse."""
    model, variables = small_model
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 128, 128, 1))
    _, _, feats = _forward_both(model, variables, x)
    xs = jnp.asarray([[3, 10, 22], [0, 31, 15]])
    ys = jnp.asarray([[4, 28, 9], [31, 0, 16]])
    win = decode.gather_windows(feats, xs, ys, 1)
    fz = decode.fuse_head_params(
        variables["params"], variables["batch_stats"],
        decode._BOND_HEAD_NAMES, decode._BOND_HEAD_WIDTHS)
    fused = decode.apply_heads_fused(fz, win, jnp.float32)
    for out, head in zip(fused, ("bond_omega", "bond_type", "bond_rho")):
        ref = decode.apply_head_sparse(
            variables["params"][f"out_{head}"],
            variables["batch_stats"][f"out_{head}"], win, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_extract_peaks_sparse_agrees(small_model):
    model, variables = small_model
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 128, 1))
    dense, heatmaps, feats = _forward_both(model, variables, x)
    cfg = decode.DecodeConfig(max_atoms=24, max_bonds=32)
    pk_d = decode.extract_peaks(dense, cfg)
    pk_s = decode.extract_peaks_sparse(heatmaps, feats,
                                       variables["params"],
                                       variables["batch_stats"], cfg,
                                       jnp.float32)
    assert set(pk_d) == set(pk_s)
    np.testing.assert_array_equal(np.asarray(pk_d["atom_xy"]),
                                  np.asarray(pk_s["atom_xy"]))
    np.testing.assert_array_equal(np.asarray(pk_d["atom_valid"]),
                                  np.asarray(pk_s["atom_valid"]))
    av = np.asarray(pk_d["atom_valid"])
    for k in ("atom_type", "atom_charge", "atom_hs"):
        np.testing.assert_array_equal(np.asarray(pk_d[k])[av],
                                      np.asarray(pk_s[k])[av])
    # Bond slots: same peaks; valid masks may differ on knife-edge
    # bins near the map border (documented divergence) — random maps
    # put peaks everywhere, so compare the slots both mark valid.
    np.testing.assert_array_equal(np.asarray(pk_d["bond_xy"]),
                                  np.asarray(pk_s["bond_xy"]))
    both = (np.asarray(pk_d["bond_valid"])
            & np.asarray(pk_s["bond_valid"]))
    agree = float(both.sum()) / max(
        1.0, float(np.asarray(pk_d["bond_valid"]).sum()))
    assert agree > 0.95
    np.testing.assert_array_equal(np.asarray(pk_d["bond_type"])[both],
                                  np.asarray(pk_s["bond_type"])[both])
    np.testing.assert_allclose(np.asarray(pk_d["bond_delta"])[both],
                               np.asarray(pk_s["bond_delta"])[both],
                               rtol=1e-3, atol=1e-3)
