"""Fused Pallas input kernel (ops/pallas_input.py) vs the XLA path.

Eval mode must be BIT-EXACT (pure unpack, rates zero); train mode is
checked distributionally (the per-pixel noise stream comes from the TPU
hardware PRNG, rates from the same JAX draw as the XLA path)."""

import jax
import jax.numpy as jnp
import numpy as np

from abcnet_tpu.data import pipeline
from abcnet_tpu.ops.pallas_input import fused_unpack_noise


def _bits(bsz=4, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((bsz, 512, 512)) < 0.06)  # ~6% ink like renders
    return jnp.asarray(np.packbits(img, axis=-1))


def test_eval_mode_bit_exact():
    bits = _bits()
    key = jax.random.PRNGKey(3)
    want = pipeline.device_unpack_bits(bits, key, amount=0.0, train=False)
    got = fused_unpack_noise(bits, key, amount=0.0, train=False)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(want)[..., 0],
                                  np.asarray(got, np.float32)[..., 0])


def test_pipeline_route_flag():
    bits = _bits(2, 1)
    key = jax.random.PRNGKey(5)
    a = pipeline.device_unpack_bits(bits, key, amount=0.0, train=False,
                                    use_pallas=True)
    b = pipeline.device_unpack_bits(bits, key, amount=0.0, train=False)
    assert a.dtype == b.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_with_pallas_input():
    # The opt-in flag must run inside the jitted grad step (the kernel
    # output is constant w.r.t. params, so no pallas VJP is required).
    from abcnet_tpu.train import trainer

    cfg = trainer.TrainConfig(batch_size=2)
    state = trainer.create_state(cfg)
    batch = pipeline.synthetic_batch(2, seed=0)
    rng = jax.random.PRNGKey(0)
    state2, total, losses, _ = trainer.train_step(
        state, batch, rng, amount=0.2, with_metrics=False,
        use_pallas_input=True)
    assert np.isfinite(float(total))
    assert int(state2.step) == 1


def test_train_mode_noise_rates():
    # With amount=0.2 the expected pixel-flip rates are
    # E[salt] = amount/200 on background, E[pepper] = amount/2 on ink
    # (rates are U(0, amount/100) and U(0, amount) per image). Check
    # the realized rates over a batch land near expectation.
    bits = _bits(8, 2)
    key = jax.random.PRNGKey(11)
    clean = np.asarray(
        fused_unpack_noise(bits, key, amount=0.0, train=False),
        np.float32)[..., 0]
    noisy = np.asarray(
        fused_unpack_noise(bits, key, amount=0.2, train=True),
        np.float32)[..., 0]
    bg = clean == 0.0
    ink = clean == 1.0
    salt_rate = float(noisy[bg].mean())
    pepper_drop = float(1.0 - noisy[ink].mean())
    assert 0.0 < salt_rate < 0.004, salt_rate        # E ~ 0.001
    assert 0.02 < pepper_drop < 0.25, pepper_drop    # E ~ 0.1
    # Noise must differ across images (per-image rates + seeds).
    flips = [(noisy[i] != clean[i]).mean() for i in range(8)]
    assert len({round(f, 6) for f in flips}) > 1
