"""Degradation augmentation tests (data/degrade.py + pipeline hook)."""

import random

import numpy as np

from abcnet_tpu.data import degrade
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.data.pipeline import sample_to_example


def _sample(seed=3):
    rng = random.Random(seed)
    while True:
        s = generate_sample(rng, mode="rdkit")
        if s is not None:
            return s


def test_erode_matches_pil_maxfilter():
    from PIL import Image, ImageFilter
    img = np.random.default_rng(0).integers(
        0, 256, (64, 64)).astype(np.uint8)
    ref = np.asarray(Image.fromarray(img).filter(ImageFilter.MaxFilter(3)),
                     np.uint8)
    assert np.array_equal(degrade.erode_strokes(img), ref)


def test_transforms_preserve_shape_and_dtype():
    img = _sample().image
    for out in (degrade.downscale(img, 256), degrade.blur(img, 1.5),
                degrade.jpeg(img, 20), degrade.erode_strokes(img),
                degrade.gray_scan(img)):
        assert out.shape == img.shape and out.dtype == np.uint8


def test_degrade_p_changes_pixels_not_labels():
    s = _sample()
    # train=False path first: geometric augment is identity there, so
    # the degraded variant is comparable pixel-for-pixel.
    clean = sample_to_example(s, random.Random(5), train=False)
    deg = sample_to_example(s, random.Random(5), train=True, degrade_p=1.0)
    assert not np.array_equal(clean.image_u8, deg.image_u8)
    for k in clean.labels:
        assert np.array_equal(clean.labels[k], deg.labels[k]), k


def test_degrade_p_zero_is_default_behavior():
    s = _sample()
    a = sample_to_example(s, random.Random(7), train=True)
    b = sample_to_example(s, random.Random(7), train=True, degrade_p=0.0)
    assert np.array_equal(a.image_u8, b.image_u8)


def test_erode_partial_bounds_and_identity():
    """p=1.0 equals the full erosion; p in (0,1) lies pixelwise between
    the original and the full erosion and differs from both."""
    img = _sample().image
    full = degrade.erode_strokes(img)
    assert np.array_equal(degrade.erode_partial(img, random.Random(2), 1.0),
                          full)
    part = degrade.erode_partial(img, random.Random(2), 0.5)
    assert np.all(part >= np.minimum(img, full))
    assert np.all(part <= np.maximum(img, full))
    assert not np.array_equal(part, img)
    assert not np.array_equal(part, full)


def test_hard_regime_keeps_ink_and_hits_tail():
    """The hard regime must (a) respect the retention guard and
    (b) actually produce tail degradations (pixels change)."""
    s = _sample()
    rng = random.Random(13)
    ink0 = (s.image.astype(np.float32) / 255.0) < 0.6
    changed = 0
    for _ in range(12):
        out = degrade.random_degrade(s.image, rng, hard=True)
        ink = (out.astype(np.float32) / 255.0) < 0.6
        overlap = (ink & ink0).sum() / max(ink0.sum(), 1)
        assert overlap > 0.25, overlap
        changed += int(not np.array_equal(out, s.image))
    assert changed == 12


def test_random_degrade_keeps_most_ink_recoverable():
    """A degraded render binarized at 0.6 must still contain a
    substantial fraction of the original strokes (the augmentation is
    a domain shift, not destruction)."""
    s = _sample()
    rng = random.Random(11)
    ink0 = (s.image.astype(np.float32) / 255.0) < 0.6
    for _ in range(8):
        out = degrade.random_degrade(s.image, rng)
        ink = (out.astype(np.float32) / 255.0) < 0.6
        overlap = (ink & ink0).sum() / max(ink0.sum(), 1)
        assert overlap > 0.3, overlap
