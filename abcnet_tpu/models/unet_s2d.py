"""Space-to-depth stem U-Net — the TPU-first flagship candidate.

Observation (models/unet.py): the production decoder consumes only the
x3 (128², 64ch), x4 (64², 128ch) and x5 (32², 256ch) skips — the
512²/16ch and 256²/32ch encoder levels exist purely to downsample.
Those two levels are where the production step burns HBM bandwidth and
MXU utilization (16/32 channels fill 1/8–1/4 of the systolic array's
lanes, and their activations are the largest tensors in the step:
(B,512,512,16) bf16 is 4.3 GB at batch 128 per traversal, fwd AND bwd).

This variant replaces them with a lossless pixel-unshuffle: the
(B,512,512,1) binary mask becomes (B,128,128,16) — every input bit
preserved as a channel — followed by MXU-friendly 64-channel convs at
128². Everything from x3 on (encoder tail, decoder, both trailing
DoubleConvs, all eight heads, the stride-4 target/decode contract) is
byte-identical to the production topology, so the whole
targets/losses/decode/assembly stack is reused unchanged.

NOT parameter-parity with the reference (this is the deliberate
TPU-first departure, cf. the CBAM variant precedent) — adopted only if
the equal-budget A/B (scripts/s2d_budget.py) shows the throughput win
does not cost detection accuracy.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .unet import (PRODUCTION_HEADS, HEAD_NAMES, DoubleConv, Down,
                   OutConv, Up)


def space_to_depth(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b), lossless rearrangement."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, c * block * block)


class UNetS2D(nn.Module):
    """Production head I/O contract on a space-to-depth stem."""
    heads: Sequence[int] = PRODUCTION_HEADS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 dense_heads: Sequence[str] = None,
                 return_features: bool = False):
        x = space_to_depth(x.astype(self.dtype), 4)     # (B,128,128,16)
        # Same learned-uncertainty init as production (unet.py:132).
        import jax
        self.param("s", lambda key: jax.random.normal(key, (10,)) / 100.0)

        # Stem at 128²: two DoubleConvs lift 16 -> 64 channels (the x3
        # role); from here the topology matches models/unet.py exactly.
        x3 = DoubleConv(64, dtype=self.dtype, name="stem1")(x, train)
        x3 = DoubleConv(64, dtype=self.dtype, name="stem2")(x3, train)
        x4 = Down(128, dtype=self.dtype, name="down3")(x3, train)
        x5 = Down(256, dtype=self.dtype, name="down4")(x4, train)
        x6 = Down(512, dtype=self.dtype, name="down5")(x5, train)

        y = Up(512, 256, dtype=self.dtype, name="up1")(x6, x5, train)
        y = Up(256, 128, dtype=self.dtype, name="up2")(y, x4, train)
        y = Up(128, 128, dtype=self.dtype, name="up3")(y, x3, train)
        y = DoubleConv(128, dtype=self.dtype, name="dconv1")(y, train)
        y = DoubleConv(128, dtype=self.dtype, name="dconv2")(y, train)

        out = {}
        names = HEAD_NAMES if len(self.heads) == len(HEAD_NAMES) else [
            f"head{i}" for i in range(len(self.heads))]
        for name, width in zip(names, self.heads):
            if dense_heads is not None and name not in dense_heads:
                continue
            out[name] = OutConv(128, width, dtype=self.dtype,
                                name=f"out_{name}")(y, train)
        if return_features:
            return out, y
        return out
