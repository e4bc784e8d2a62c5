"""Packed peak transport roundtrip (decode.pack_peaks /
unpack_peaks_host): the serving path fetches TWO device buffers per
batch instead of ~13 (each fetch is a full round trip under the axon
tunnel), so the pack/unpack pair must be bit-exact and dtype-exact."""

import jax
import numpy as np

from abcnet_tpu.infer.decode import (pack_peaks, peaks_spec,
                                     unpack_peaks_host)


def _fake_peaks(b=3, ka=5, kb=4):
    r = np.random.RandomState(0)
    return {
        "atom_xy": r.randint(0, 128, (b, ka, 2)).astype(np.int32),
        "atom_type": r.randint(0, 14, (b, ka)).astype(np.int32),
        "atom_valid": r.rand(b, ka) > 0.5,
        "atom_score": r.rand(b, ka).astype(np.float32),
        "atom_sub": r.randn(b, ka, 2).astype(np.float32),
        "bond_xy": r.randint(0, 128, (b, kb, 2)).astype(np.int32),
        "bond_delta": r.randn(b, kb, 2).astype(np.float32),
        "bond_valid": r.rand(b, kb) > 0.3,
        "bond_score": r.rand(b, kb).astype(np.float32),
    }


def test_roundtrip_exact():
    peaks = _fake_peaks()
    spec = peaks_spec(peaks)
    ibuf, fbuf = jax.jit(pack_peaks)(peaks)
    out = unpack_peaks_host(ibuf, fbuf, spec)
    assert set(out) == set(peaks)
    for k, v in peaks.items():
        assert out[k].dtype == v.dtype, k
        assert out[k].shape == v.shape, k
        np.testing.assert_array_equal(out[k], v, err_msg=k)


def test_spec_is_static_across_values():
    a, b = _fake_peaks(), _fake_peaks()
    for k in b:
        b[k] = b[k][::-1].copy() if b[k].ndim else b[k]
    assert peaks_spec(a) == peaks_spec(b)
