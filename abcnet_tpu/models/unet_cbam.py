"""CBAM U-Net variant (flax, NHWC) — parity with /root/reference/src/unet2.py.

Differences from the production model, mirrored from the reference:
  * stem widened to 32 channels with k5 convs (unet2.py:135-137)
  * DoubleConv = (conv-BN-ReLU, conv-BN) + CBAM (channel + spatial
    attention, unet2.py:6-46) + residual 1x1 shortcut, ReLU after the
    add (unet2.py:62-74)
  * OutConv without Dropout (unet2.py:116-126)
11,177,340 parameters at heads (1,14,3,2,1,360,60,60) (verified against
an instantiation of the reference model, SURVEY.md section 2.3).

The reference never wires this variant into its scripts; it is provided
for the same experimentation role. Interface matches models.unet.UNet.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import (HEAD_NAMES, PRODUCTION_HEADS, _crop_or_pad_to,
                   init_unet, param_count)


class ChannelAttention(nn.Module):
    """Squeeze (avg+max) -> shared MLP -> sigmoid gate (unet2.py:6-22)."""
    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = max(self.features // self.reduction, 1)
        mlp = nn.Sequential([nn.Dense(mid, dtype=self.dtype), nn.relu,
                             nn.Dense(self.features, dtype=self.dtype)])
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        gate = jax.nn.sigmoid(mlp(avg) + mlp(mx))
        return gate[:, None, None, :]


class SpatialAttention(nn.Module):
    """Channel mean/max -> conv7x7 -> sigmoid gate (unet2.py:24-35)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = nn.Conv(1, (7, 7), padding="SAME", dtype=self.dtype)(s)
        return jax.nn.sigmoid(s)


class CBAM(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(self.features, dtype=self.dtype)(x) * x
        x = SpatialAttention(dtype=self.dtype)(x) * x
        return x


class DoubleConvCBAM(nn.Module):
    """(conv-BN-ReLU, conv-BN, CBAM) + residual shortcut, final ReLU
    (unet2.py:49-74)."""
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        res = x
        k = (self.kernel, self.kernel)
        y = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(y)
        y = nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(y).astype(
                             self.dtype)
        y = CBAM(self.features, dtype=self.dtype)(y)
        if x.shape[-1] != self.features:
            res = nn.Conv(self.features, (1, 1), dtype=self.dtype)(res)
        return nn.relu(y + res)


class DownCBAM(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConvCBAM(self.features, dtype=self.dtype)(x, train)


class UpCBAM(nn.Module):
    in_features: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = nn.ConvTranspose(self.in_features // 2, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)(x)
        x = _crop_or_pad_to(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        return DoubleConvCBAM(self.out_features, dtype=self.dtype)(x, train)


class OutConvNoDropout(nn.Module):
    """Conv3x3 -> BN -> LeakyReLU -> Conv1x1 (unet2.py:116-126)."""
    in_features: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.in_features, (3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, negative_slope=0.01).astype(self.dtype)
        x = nn.Conv(self.out_features, (1, 1), dtype=self.dtype)(x)
        return x


class UNetCBAM(nn.Module):
    """CBAM U-Net (unet2.py:129-175). Same I/O contract as UNet."""
    heads: Sequence[int] = PRODUCTION_HEADS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        self.param("s", lambda key: jax.random.normal(key, (10,)) / 100.0)

        x1 = DoubleConvCBAM(32, kernel=5, dtype=self.dtype,
                            name="inc1")(x, train)
        x1 = DoubleConvCBAM(32, kernel=5, dtype=self.dtype,
                            name="inc2")(x1, train)
        x2 = DownCBAM(32, dtype=self.dtype, name="down1")(x1, train)
        x3 = DownCBAM(64, dtype=self.dtype, name="down2")(x2, train)
        x3 = DoubleConvCBAM(64, dtype=self.dtype, name="inc3")(x3, train)
        x4 = DownCBAM(128, dtype=self.dtype, name="down3")(x3, train)
        x5 = DownCBAM(256, dtype=self.dtype, name="down4")(x4, train)
        x6 = DownCBAM(512, dtype=self.dtype, name="down5")(x5, train)

        y = UpCBAM(512, 256, dtype=self.dtype, name="up1")(x6, x5, train)
        y = UpCBAM(256, 128, dtype=self.dtype, name="up2")(y, x4, train)
        y = UpCBAM(128, 128, dtype=self.dtype, name="up3")(y, x3, train)
        y = DoubleConvCBAM(128, dtype=self.dtype, name="dconv1")(y, train)
        y = DoubleConvCBAM(128, dtype=self.dtype, name="dconv2")(y, train)

        out = {}
        names = HEAD_NAMES if len(self.heads) == len(HEAD_NAMES) else [
            f"head{i}" for i in range(len(self.heads))]
        for name, width in zip(names, self.heads):
            out[name] = OutConvNoDropout(
                128, width, dtype=self.dtype,
                name=f"out_{name}")(y, train).astype(jnp.float32)
        return out
