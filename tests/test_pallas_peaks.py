"""Parity: Pallas fused NMS+top-K vs the XLA path in infer/decode.py.

Runs the kernel in interpreter mode (CPU test environment); the
contract is bit-equal scores/indices against maxpool2d_same + mask +
lax.top_k, including plateau ties and threshold edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abcnet_tpu.ops.pallas_peaks import nms_topk
from abcnet_tpu.train.metrics import maxpool2d_same


def _xla_reference(logit, k, threshold):
    pooled = maxpool2d_same(logit[..., None])[..., 0]
    mask = (pooled == logit) & (logit > threshold)
    scores = jnp.where(mask, logit, -jnp.inf).reshape(logit.shape[0], -1)
    return jax.lax.top_k(scores, k)


@pytest.mark.parametrize("shape,k", [((3, 32, 32), 16),
                                     ((2, 128, 128), 128)])
def test_random_maps_match(shape, k):
    rng = np.random.default_rng(0)
    logit = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 3)
    ref_s, ref_i = _xla_reference(logit, k, -1.0)
    s, i = nms_topk(logit, k, -1.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(s))
    # Indices only comparable where score is finite (XLA top_k returns
    # arbitrary order among the -inf padding slots).
    finite = np.isfinite(np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(ref_i)[finite],
                                  np.asarray(i)[finite])


def test_plateau_ties_and_threshold():
    # A 2x2 plateau of equal values survives NMS at every cell (the
    # reference's == compare), and values exactly at the threshold drop.
    g = 32
    m = np.full((1, g, g), -5.0, np.float32)
    m[0, 4:6, 4:6] = 2.0            # plateau: all four survive
    m[0, 20, 20] = -1.0             # exactly threshold: dropped
    m[0, 10, 25] = 7.0              # isolated peak
    logit = jnp.asarray(m)
    ref_s, ref_i = _xla_reference(logit, 8, -1.0)
    s, i = nms_topk(logit, 8, -1.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(s))
    finite = np.isfinite(np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(ref_i)[finite],
                                  np.asarray(i)[finite])
    assert np.asarray(s)[0, 0] == 7.0
    assert (np.asarray(s)[0, 1:5] == 2.0).all()
    assert np.isfinite(np.asarray(s)[0]).sum() == 5


def test_edge_peaks_survive():
    # Corner/edge cells pool over the in-bounds neighborhood only
    # (SAME semantics) — a corner max must survive.
    g = 32
    m = np.zeros((1, g, g), np.float32)
    m[0, 0, 0] = 3.0
    m[0, 0, g - 1] = 4.0
    m[0, g - 1, g - 1] = 5.0
    logit = jnp.asarray(m)
    ref_s, ref_i = _xla_reference(logit, 4, 0.5)
    s, i = nms_topk(logit, 4, 0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(s))
    assert set(np.asarray(s)[0][np.isfinite(np.asarray(s)[0])]) == \
        {3.0, 4.0, 5.0}


def test_extract_peaks_pallas_path_matches():
    """End-to-end extract_peaks parity: XLA vs Pallas peak selection."""
    from abcnet_tpu.infer.decode import DecodeConfig, extract_peaks

    rng = np.random.default_rng(7)
    B, G = 2, 32
    preds = {
        "atom_target": jnp.asarray(rng.normal(size=(B, G, G, 1)),
                                   jnp.float32),
        "atom_type": jnp.asarray(rng.normal(size=(B, G, G, 14)),
                                 jnp.float32),
        "atom_charge": jnp.asarray(rng.normal(size=(B, G, G, 3)),
                                   jnp.float32),
        "atom_hs": jnp.asarray(rng.normal(size=(B, G, G, 2)),
                               jnp.float32),
        "bond_target": jnp.asarray(rng.normal(size=(B, G, G, 1)),
                                   jnp.float32),
        "bond_type": jnp.asarray(rng.normal(size=(B, G, G, 360)),
                                 jnp.float32),
        "bond_rho": jnp.asarray(rng.normal(size=(B, G, G, 60)),
                                jnp.float32),
        "bond_omega": jnp.asarray(rng.normal(size=(B, G, G, 60)),
                                  jnp.float32),
    }
    base = extract_peaks(preds, DecodeConfig(max_atoms=16, max_bonds=24))
    fast = extract_peaks(preds, DecodeConfig(max_atoms=16, max_bonds=24,
                                             use_pallas_nms=True))
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(fast[k]), err_msg=k)
