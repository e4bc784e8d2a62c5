"""Lossless checkpoint conversion between the production per-head
OutConv layout and the fused head-bank layout (UNet(fused_head_bank=True)).

The fusion is exact math, not an approximation: concatenating the n
per-head 3x3 kernels along the output-channel axis gives one conv whose
output slices equal the per-head outputs, and one (n*128)-channel
BatchNorm is identical to n separate 128-channel BatchNorms because BN
statistics/affine are per-channel. The per-head 1x1 convs are unchanged
(they read only their own slice). Hence production checkpoints train
under the fused model and fused checkpoints serve under the production
model (the sparse-head serving path, infer/decode.apply_head_sparse,
requires the per-head layout).

Reference anchor: the per-head OutConv stack is the parity surface of
/root/reference/src/unet.py:63-74,96-119; fusion changes its schedule,
not its semantics.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from .unet import HEAD_NAMES, PRODUCTION_HEADS


def _names(heads: Sequence[int]):
    return HEAD_NAMES if len(heads) == len(HEAD_NAMES) else [
        f"head{i}" for i in range(len(heads))]


def fuse_head_variables(variables: Dict,
                        heads: Sequence[int] = PRODUCTION_HEADS) -> Dict:
    """Production-layout variables -> fused-head-bank layout."""
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    names = _names(heads)

    def cat(get):
        return jnp.concatenate([get(params[f"out_{n}"]) for n in names],
                               axis=-1)

    def cat_s(get):
        return jnp.concatenate(
            [get(stats[f"out_{n}"]["BatchNorm_0"]) for n in names], axis=-1)

    params["head_bank"] = {
        "kernel": cat(lambda h: h["Conv_0"]["kernel"]),
        "bias": cat(lambda h: h["Conv_0"]["bias"]),
    }
    params["head_bank_bn"] = {
        "scale": cat(lambda h: h["BatchNorm_0"]["scale"]),
        "bias": cat(lambda h: h["BatchNorm_0"]["bias"]),
    }
    stats["head_bank_bn"] = {"mean": cat_s(lambda s: s["mean"]),
                             "var": cat_s(lambda s: s["var"])}
    for n in names:
        params[f"out1_{n}"] = params[f"out_{n}"]["Conv_1"]
        del params[f"out_{n}"]
        del stats[f"out_{n}"]
    return {"params": params, "batch_stats": stats}


def unfuse_head_variables(variables: Dict,
                          heads: Sequence[int] = PRODUCTION_HEADS) -> Dict:
    """Fused-head-bank variables -> production per-head layout."""
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    names = _names(heads)
    bank = params.pop("head_bank")
    bn = params.pop("head_bank_bn")
    bns = stats.pop("head_bank_bn")
    for i, n in enumerate(names):
        sl = slice(i * 128, (i + 1) * 128)
        params[f"out_{n}"] = {
            "Conv_0": {"kernel": bank["kernel"][..., sl],
                       "bias": bank["bias"][sl]},
            "BatchNorm_0": {"scale": bn["scale"][sl],
                            "bias": bn["bias"][sl]},
            "Conv_1": params.pop(f"out1_{n}"),
        }
        stats[f"out_{n}"] = {"BatchNorm_0": {"mean": bns["mean"][sl],
                                             "var": bns["var"][sl]}}
    return {"params": params, "batch_stats": stats}
