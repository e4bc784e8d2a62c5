"""Data pipeline tests: device preprocessing parity + batch plumbing."""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.generate import generate_sample


def test_device_preprocess_matches_host_binarize():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    out = pipeline.device_preprocess(jnp.asarray(img), jax.random.PRNGKey(0),
                                     train=False)
    expect = ((img.astype(np.float32) / 255.0) < 0.6).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out)[..., 0], expect)


def test_device_preprocess_noise_bounds():
    img = np.full((4, 64, 64), 255, np.uint8)  # all white -> no ink
    out = pipeline.device_preprocess(jnp.asarray(img), jax.random.PRNGKey(1),
                                     amount=0.5, train=True)
    frac = float(np.asarray(out).mean())
    # Only salt noise can appear, at rate < amount/100 = 0.005 per image.
    assert 0.0 <= frac < 0.01


def test_sample_to_example_and_collate():
    rng = random.Random(3)
    examples = []
    while len(examples) < 3:
        s = generate_sample(rng)
        if s is not None:
            examples.append(pipeline.sample_to_example(s, rng, train=True))
    batch = pipeline.collate(examples)
    assert batch["image_bits"].shape == (3, 512, 512 // 8)
    assert batch["image_bits"].dtype == np.uint8
    assert batch["atoms"].shape[1:] == (96, 5)
    assert batch["bonds_i"].shape[1:] == (112, 4)
    assert (batch["n_atoms"] > 0).all()
    assert (batch["n_bonds"] > 0).all()
    # Label coordinates land on the stride-4 grid.
    for i in range(3):
        n = batch["n_atoms"][i]
        assert (batch["atoms"][i, :n, :2] >= 0).all()
        assert (batch["atoms"][i, :n, :2] < 128).all()


def test_geometric_augment_rescales_labels_consistently():
    rng = random.Random(11)
    sample = None
    while sample is None:
        sample = generate_sample(rng)
    # Force the rescale branch by trying seeds until scale != 1.
    for seed in range(50):
        r = random.Random(seed)
        img, p = pipeline._geometric_augment(sample.image, r, train=True)
        if p.scale_x != 1.0 or p.scale_y != 1.0:
            assert img.shape == (512, 512)
            assert p.ddx >= 0 and p.ddy >= 0
            break
    else:
        pytest.fail("rescale branch never taken in 50 seeds")


def test_batches_from_examples_drop_remainder():
    rng = random.Random(5)
    examples = []
    while len(examples) < 5:
        s = generate_sample(rng)
        if s is not None:
            examples.append(pipeline.sample_to_example(s, rng, train=False))
    batches = list(pipeline.batches_from_examples(examples, 2, seed=0))
    assert len(batches) == 2
    assert all(b["image_bits"].shape[0] == 2 for b in batches)


def test_prefetch_iterator_preserves_items():
    it = pipeline.PrefetchIterator(iter(range(10)), depth=2)
    assert list(it) == list(range(10))


def test_synthetic_batch_sizes():
    b = pipeline.synthetic_batch(2, size=128)
    assert b["image_bits"].shape == (2, 128, 128 // 8)
    assert (b["atoms"][:, :24, :2] < 32).all()


def test_pack_unpack_bits_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    bits = pipeline.pack_images(img, threshold=0.6)
    out = pipeline.device_unpack_bits(jnp.asarray(bits),
                                      jax.random.PRNGKey(0), train=False)
    expect = ((img.astype(np.float32) / 255.0) < 0.6).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out)[..., 0], expect)


def test_otsu_threshold_separates_bimodal():
    from abcnet_tpu.data.binarize import (binarize_otsu, otsu_threshold,
                                          otsu_threshold_jax)
    rng = np.random.default_rng(0)
    img = np.where(rng.random((64, 64)) < 0.3,
                   rng.integers(0, 60, (64, 64)),
                   rng.integers(200, 256, (64, 64))).astype(np.uint8)
    t = otsu_threshold(img)
    # any threshold from the top of the dark class through the gap
    # separates the modes; Otsu returns the first maximizer
    assert 55 <= t < 200
    tj = int(otsu_threshold_jax(jnp.asarray(img)))
    assert abs(tj - t) <= 1
    mask = binarize_otsu(img)
    assert 0.25 < mask.mean() < 0.35
