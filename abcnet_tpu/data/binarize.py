"""Otsu thresholding — parity with the reference's binarize.py demo.

The reference ships a 10-line standalone Otsu visualization
(/root/reference/binarize.py:4-5, via cv2.threshold THRESH_OTSU); its
production paths use fixed thresholds instead (0.6 train utils.py:63,
0.2 test utils_for_test.py:23 — see data/augment.py and
data/pipeline.py). This module provides the Otsu criterion itself, as a
host numpy routine and a jit-able JAX variant usable inside the
device-side preprocessing when a fixed threshold is not appropriate
(e.g. scanned real-world images with nonuniform contrast).
"""

from __future__ import annotations

import numpy as np

__all__ = ["otsu_threshold", "otsu_threshold_jax", "binarize_otsu"]


def otsu_threshold(img_u8: np.ndarray) -> int:
    """Classic Otsu: threshold maximizing between-class variance."""
    hist = np.bincount(np.asarray(img_u8, np.uint8).reshape(-1),
                       minlength=256).astype(np.float64)
    total = hist.sum()
    omega = np.cumsum(hist) / total                    # class-0 mass
    mu = np.cumsum(hist * np.arange(256)) / total      # cumulative mean
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    denom[denom == 0] = np.inf
    sigma_b = (mu_t * omega - mu) ** 2 / denom
    return int(np.argmax(sigma_b))


def binarize_otsu(img_u8: np.ndarray) -> np.ndarray:
    """Foreground (ink) mask via Otsu, matching the demo's orientation:
    dark pixels are foreground."""
    t = otsu_threshold(img_u8)
    return (np.asarray(img_u8) <= t).astype(np.float32)


def otsu_threshold_jax(img_u8):
    """jit-able Otsu over a uint8 image (any shape)."""
    import jax.numpy as jnp
    flat = jnp.reshape(img_u8, (-1,)).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.float32).at[flat].add(1.0)
    total = jnp.sum(hist)
    omega = jnp.cumsum(hist) / total
    mu = jnp.cumsum(hist * jnp.arange(256, dtype=jnp.float32)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 0,
                        (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-12),
                        0.0)
    return jnp.argmax(sigma_b)
