"""Multi-head U-Net keypoint detector (flax, NHWC, bf16-friendly).

Topology parity with the reference production model
(/root/reference/src/unet.py:77-119): stem DoubleConv pair at 16ch,
encoder 16-32-64(-inc3)-128-256-512 via maxpool downs, decoder with
k3 s2 transposed convs + skip concat, two trailing DoubleConvs at 128ch,
and one OutConv head per output group — all heads at stride 4 (128x128
for 512x512 inputs). 10,698,575 parameters for the production config
heads=(1,14,3,2,1,360,60,60) incl. the 10 learned homoscedastic
uncertainty weights ``s`` (unet.py:82).

TPU-first departures from the reference implementation (not topology):
NHWC layout, optional bfloat16 compute with f32 params/BN stats, and the
k3 s2 transposed conv's odd-size output (2H+1) cropped with lax.pad
negative padding to match the skip — reproducing torch's
F.pad([-1, 0]) semantics (unet.py:51-55) without host logic.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

PRODUCTION_HEADS: Tuple[int, ...] = (1, 14, 3, 2, 1, 360, 60, 60)
LEGACY_HEADS: Tuple[int, ...] = (1, 20, 5, 1, 90, 90, 30, 30)

HEAD_NAMES = ("atom_target", "atom_type", "atom_charge", "atom_hs",
              "bond_target", "bond_type", "bond_rho", "bond_omega")


class DoubleConv(nn.Module):
    """(conv k -> BN -> ReLU) x2  (reference unet.py:6-21)."""
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(2):
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        padding="SAME", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(x)
            x = nn.relu(x)
            x = x.astype(self.dtype)
        return x


def _maybe_remat(cls, remat: bool):
    """Wrap a block module class in flax checkpointing (save only block
    inputs; recompute internals during backward). Used by the
    remat_blocks throughput/capacity lever — the wrapped class keeps
    the original param tree (lifted transforms are name-transparent;
    asserted by tests/test_trainer.py::test_unet_remat_param_parity).
    `train` (call arg index 2, after self/x) must be static: BatchNorm
    branches on it in Python."""
    if not remat:
        return cls
    return nn.remat(cls, static_argnums=(2,))


class Down(nn.Module):
    """MaxPool 2x2 then DoubleConv (unet.py:24-35)."""
    features: int
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return _maybe_remat(DoubleConv, self.remat)(
            self.features, dtype=self.dtype, name="DoubleConv_0")(x, train)


def _crop_or_pad_to(x, target_h: int, target_w: int):
    """Match spatial dims to the skip tensor, reproducing the reference's
    asymmetric F.pad (unet.py:51-55): amounts (d//2, d - d//2), negative
    values crop."""
    dh = target_h - x.shape[1]
    dw = target_w - x.shape[2]
    cfg = [(0, 0, 0), (dh // 2, dh - dh // 2, 0),
           (dw // 2, dw - dw // 2, 0), (0, 0, 0)]
    return jax.lax.pad(x, jnp.zeros((), x.dtype), cfg)


class Up(nn.Module):
    """Transposed conv k3 s2 (channels halved), crop/pad to skip, concat,
    DoubleConv (unet.py:38-60)."""
    in_features: int
    out_features: int
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = nn.ConvTranspose(self.in_features // 2, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)(x)
        x = _crop_or_pad_to(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        return _maybe_remat(DoubleConv, self.remat)(
            self.out_features, dtype=self.dtype,
            name="DoubleConv_0")(x, train)


class OutConv(nn.Module):
    """Conv3x3 -> BN -> LeakyReLU -> Dropout(0.2) -> Conv1x1 (unet.py:63-74)."""
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
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Conv(self.out_features, (1, 1), dtype=self.dtype)(x)
        return x


class UNet(nn.Module):
    """Production multi-head U-Net.

    Input: NHWC float images (B, 512, 512, 1).
    Output: dict head_name -> (B, 128, 128, width) float32 logits, plus
    the learned uncertainty vector ``s`` under param collection.
    """
    heads: Sequence[int] = PRODUCTION_HEADS
    dtype: Any = jnp.float32
    # Train-throughput lever (scripts/roofline.py): the 8 per-head
    # OutConv 3x3s each re-read the shared (B,G,G,128) trunk and each
    # contributes a separate grad map to it in backward — the single
    # largest HBM term in the step's roofline. fused_head_bank=True
    # computes them as ONE 128->128*n conv + ONE n*128-channel BN
    # (BatchNorm is per-channel, so this is mathematically identical to
    # n separate BNs over the slices) + per-head 1x1s on the slices.
    # Checkpoints convert losslessly both ways (models/fuse_heads.py).
    fused_head_bank: bool = False
    # Per-block activation rematerialization (VERDICT r4 #6): block
    # names whose internals are recomputed during backward instead of
    # stored. The 512^2/256^2 low-channel levels are the candidates —
    # their stored activations are the step's largest HBM write+read
    # terms (scripts/roofline.py: ~1 GB/tensor at batch 128) while
    # their recompute is cheap tile-starved MXU work. Checkpoint trees
    # are unchanged (lifted transforms are name-transparent).
    remat_blocks: Sequence[str] = ()

    @nn.compact
    def __call__(self, x, train: bool = False,
                 dense_heads: Sequence[str] = None,
                 return_features: bool = False):
        """dense_heads: if given, only these heads are computed densely
        (the others' OutConv params stay untouched in the variables dict
        — flax ignores unused entries). return_features additionally
        returns the shared (B, G, G, 128) trunk feature map so callers
        can evaluate the remaining heads sparsely at peak cells
        (infer/decode.py:apply_head_sparse) — the wide heads (360/60ch)
        never materialize as full maps, which is what capped serving at
        batch 128 (a (256,128,128,360) f32 head output is ~6 GB)."""
        x = x.astype(self.dtype)
        # Learned homoscedastic uncertainty weights (unet.py:82).
        self.param("s", lambda key: jax.random.normal(key, (10,)) / 100.0)

        rb = frozenset(self.remat_blocks)

        def dc(features, name):
            return _maybe_remat(DoubleConv, name in rb)(
                features, dtype=self.dtype, name=name)

        def down(features, name):
            return Down(features, dtype=self.dtype, name=name,
                        remat=name in rb)

        x1 = dc(16, "inc1")(x, train)
        x1 = dc(16, "inc2")(x1, train)
        x2 = down(32, "down1")(x1, train)
        x3 = down(64, "down2")(x2, train)
        x3 = dc(64, "inc3")(x3, train)
        x4 = down(128, "down3")(x3, train)
        x5 = down(256, "down4")(x4, train)
        x6 = down(512, "down5")(x5, train)

        y = Up(512, 256, dtype=self.dtype, name="up1",
               remat="up1" in rb)(x6, x5, train)
        y = Up(256, 128, dtype=self.dtype, name="up2",
               remat="up2" in rb)(y, x4, train)
        y = Up(128, 128, dtype=self.dtype, name="up3",
               remat="up3" in rb)(y, x3, train)
        y = dc(128, "dconv1")(y, train)
        y = dc(128, "dconv2")(y, train)

        out = {}
        names = HEAD_NAMES if len(self.heads) == len(HEAD_NAMES) else [
            f"head{i}" for i in range(len(self.heads))]
        if self.fused_head_bank:
            n = len(self.heads)
            yb = nn.Conv(128 * n, (3, 3), padding="SAME",
                         dtype=self.dtype, name="head_bank")(y)
            yb = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=jnp.float32,
                              name="head_bank_bn")(yb)
            yb = nn.leaky_relu(yb, negative_slope=0.01).astype(self.dtype)
            yb = nn.Dropout(0.2, deterministic=not train)(yb)
            for i, (name, width) in enumerate(zip(names, self.heads)):
                if dense_heads is not None and name not in dense_heads:
                    continue
                out[name] = nn.Conv(width, (1, 1), dtype=self.dtype,
                                    name=f"out1_{name}")(
                    yb[..., i * 128:(i + 1) * 128])
            if return_features:
                return out, y
            return out
        for name, width in zip(names, self.heads):
            if dense_heads is not None and name not in dense_heads:
                continue
            # Heads keep the compute dtype (bf16 in production): the
            # values are bf16-precision either way (the 1x1 conv runs in
            # self.dtype), and an f32 cast here materializes the wide
            # 360/60-ch maps at double the HBM cost — consumers upcast
            # after their gathers instead (ops/losses.py:activations,
            # infer/decode.py).
            out[name] = _maybe_remat(OutConv, "heads" in rb)(
                128, width, dtype=self.dtype, name=f"out_{name}")(y, train)
        if return_features:
            return out, y
        return out


def create_unet(heads: Sequence[int] = PRODUCTION_HEADS,
                dtype: Any = jnp.float32) -> UNet:
    return UNet(heads=tuple(heads), dtype=dtype)


def init_unet(rng, model: UNet, input_shape=(1, 512, 512, 1)):
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros(input_shape, jnp.float32), train=False)
    return variables


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
