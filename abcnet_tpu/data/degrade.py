"""Scan-style image degradations: shared by training augmentation and
the degraded benchmark.

The reference's real-world target is the UOB scanned benchmark
(/root/reference/src/img2smiles2.py:36, binarize threshold 0.2 at
src/utils_for_test.py:23); it *trains* with salt/pepper only
(src/utils.py:73-80) but *evaluates* on scans. Clean-trained models
collapse under blur/erosion (logs/degraded_bench_r2.log: 0.055/0.031
exact), so the trainer can mix these transforms in at a modest rate
(pipeline.sample_to_example(degrade_p=...)) — the degradation-robust
training the scanned-domain capability requires.

All transforms operate on the grayscale uint8 canvas BEFORE
binarization and move no label coordinates (downscale round-trips back
to the original size), so the compact labels are untouched.
"""

from __future__ import annotations

import io
import random

import numpy as np
from PIL import Image, ImageFilter


def _pil(img: np.ndarray) -> Image.Image:
    return Image.fromarray(img)


def _np(img: Image.Image) -> np.ndarray:
    return np.asarray(img, np.uint8)


def downscale(img: np.ndarray, to: int) -> np.ndarray:
    """Resolution loss: bilinear down to ``to`` px and back."""
    size = img.shape[0]
    small = _pil(img).resize((to, to), Image.BILINEAR)
    return _np(small.resize((size, size), Image.BILINEAR))


def blur(img: np.ndarray, radius: float) -> np.ndarray:
    return _np(_pil(img).filter(ImageFilter.GaussianBlur(radius)))


def jpeg(img: np.ndarray, quality: int) -> np.ndarray:
    buf = io.BytesIO()
    _pil(img).save(buf, format="JPEG", quality=quality)
    buf.seek(0)
    return _np(Image.open(buf).convert("L"))


def erode_strokes(img: np.ndarray) -> np.ndarray:
    """Thin dark strokes by one pixel ring — separable numpy 3x3 max
    (PIL.MaxFilter(3) equivalent at ~10x less host time; the square
    structuring element factors into a row max then a column max)."""
    a = np.asarray(img)
    r = a.copy()
    np.maximum(r[:, 1:], a[:, :-1], out=r[:, 1:])
    np.maximum(r[:, :-1], a[:, 1:], out=r[:, :-1])
    out = r.copy()
    np.maximum(out[1:, :], r[:-1, :], out=out[1:, :])
    np.maximum(out[:-1, :], r[1:, :], out=out[:-1, :])
    return out


def gray_scan(img: np.ndarray) -> np.ndarray:
    """Low-contrast 'scan': mid-gray background (~0.5), dark strokes
    (~0.1) — recovered by the reference's 0.2 threshold, flooded by the
    training default 0.6 (utils_for_test.py:23)."""
    f = img.astype(np.float32) / 255.0
    out = np.where(f < 0.5, 0.08 + 0.06 * f, 0.46 + 0.08 * f)
    return (out * 255).astype(np.uint8)


def erode_partial(img: np.ndarray, rng: random.Random,
                  p: float) -> np.ndarray:
    """Ragged stroke thinning: the 3x3 erosion applied to a Bernoulli
    p-subset of pixels. Real scan/photocopy erosion is never uniform —
    strokes thin raggedly, keeping SOME ink everywhere — and unlike the
    full erosion (which deletes 1-2 px strokes outright, an unlearnable
    target) a partial erosion leaves a learnable heat-map signal while
    exposing the model to erosion statistics. p=1.0 == erode_strokes."""
    full = erode_strokes(img)
    nprng = np.random.default_rng(rng.randrange(2**31))
    mask = nprng.random(img.shape) < p
    return np.where(mask, full, img).astype(np.uint8)


def random_degrade(img: np.ndarray, rng: random.Random,
                   threshold: float = 0.6,
                   min_retention: float = 0.35,
                   hard: bool = False) -> np.ndarray:
    """One training-time degradation, drawn from the same families the
    degraded benchmark evaluates (scripts/degraded_bench.py VARIANTS).
    gray_scan is excluded: its fix is the binarize threshold (0.2), not
    the model.

    Retention guard: erosion/heavy blur erases 1-2 px strokes entirely
    (measured: 15% ink left on a width-1 render) — a training image
    whose atoms have no ink is an unlearnable target that teaches the
    heatmap head to hallucinate. If the binarized ink retention drops
    below ``min_retention`` the sample falls back to a mild downscale.

    ``hard=True`` is the robustness-fine-tune regime targeting the two
    measured collapse cases (logs/degraded_r5d.log: blur_r2 0.2031,
    erode 0.1797): the family draw is biased toward blur/erode, the
    blur range brackets the benchmark's radius 2.0 (the default tops
    out at 2.2 so r≈2 is a thin tail), and erosion is the partial
    (ragged) kind — under the default regime the retention guard
    replaces nearly every erode draw on thin-stroke renders with a
    downscale, so the model trains on almost no erosion at all."""
    if hard:
        u = rng.random()
        if u < 0.15:
            out = downscale(img, rng.randint(224, 448))
        elif u < 0.50:
            out = blur(img, rng.uniform(1.2, 2.6))
        elif u < 0.65:
            out = jpeg(img, rng.randint(10, 45))
        else:
            out = erode_partial(img, rng, rng.uniform(0.6, 1.0))
    else:
        k = rng.randrange(4)
        if k == 0:
            out = downscale(img, rng.randint(224, 448))
        elif k == 1:
            out = blur(img, rng.uniform(0.6, 2.2))
        elif k == 2:
            out = jpeg(img, rng.randint(10, 45))
        else:
            out = erode_strokes(img)
    ink0 = (img.astype(np.float32) / 255.0) < threshold
    ink = (out.astype(np.float32) / 255.0) < threshold
    denom = max(int(ink0.sum()), 1)
    if (ink & ink0).sum() / denom < min_retention:
        if hard:
            # Keep the erosion statistics in-distribution instead of
            # swapping the family: retry ragged erosion at half rate.
            out = erode_partial(img, rng, 0.5)
            ink = (out.astype(np.float32) / 255.0) < threshold
            if (ink & ink0).sum() / denom >= min_retention:
                return out
        out = downscale(img, rng.randint(352, 448))
    return out
