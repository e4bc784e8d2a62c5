"""Post-training int8 quantization of the serving backbone.

The v5e MXU's int8 peak (394 TOPS) is 2x its bf16 peak, and serving is
trunk-conv-dominated (scripts/roofline.py), so an s8 x s8 -> s32 conv
path is the next serving-throughput lever after sparse head evaluation.

Pipeline:
  1. ``fold_eval_params``  — eval-mode BatchNorm folded into conv
     weights/biases (BN is affine at inference), producing a flat layer
     table mirroring models/unet.py topology.
  2. ``forward_folded``    — float forward over the folded table with
     the same ``(heads, features)`` contract as
     ``UNet.apply(..., dense_heads=..., return_features=True)``; also
     the calibration recorder (per-site |activation| maxima).
  3. ``quantize_folded``   — per-output-channel int8 weights + per-site
     activation scales.
  4. ``forward_quant``     — int8 forward: each conv quantizes its
     input at the calibrated site scale, runs s8 conv with s32
     accumulation, and dequantizes into the bf16 carry; elementwise
     (relu / pool / crop / concat) stays bf16 so HBM traffic matches
     the production path. The per-head 1x1s stay float (negligible).

``make_infer_pipeline(state, quant_calib=images)`` (infer/decode.py)
swaps this backbone into the sparse serving path; the peak extraction
and sparse wide-head evaluation are unchanged.

The reference has no quantized path (serving is
/root/reference/src/img2smiles2.py full-precision torch); this is a
TPU-native extension, accuracy-gated by scripts/quant_eval.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import _crop_or_pad_to

_EPS = 1e-5
_DC_BLOCKS = ("inc1", "inc2", "down1", "down2", "inc3", "down3",
              "down4", "down5", "dconv1", "dconv2")
_UPS = ("up1", "up2", "up3")


def _fold(conv: Dict, bn: Dict, st: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    f = bn["scale"] * jax.lax.rsqrt(st["var"] + _EPS)
    k = conv["kernel"].astype(jnp.float32) * f
    b = (conv["bias"].astype(jnp.float32) - st["mean"]) * f + bn["bias"]
    return k, b


def fold_eval_params(variables: Dict,
                     dense_heads: Sequence[str] = ("atom_target",
                                                   "bond_target")) -> Dict:
    """Flatten the UNet param tree into folded (kernel, bias) pairs."""
    p, s = variables["params"], variables["batch_stats"]

    def dc(pp, ss):
        return [_fold(pp[f"Conv_{i}"], pp[f"BatchNorm_{i}"],
                      ss[f"BatchNorm_{i}"]) for i in (0, 1)]

    F: Dict = {}
    for name in _DC_BLOCKS:
        if name.startswith("down"):
            F[name] = dc(p[name]["DoubleConv_0"], s[name]["DoubleConv_0"])
        else:
            F[name] = dc(p[name], s[name])
    for name in _UPS:
        F[name] = {
            "t": (p[name]["ConvTranspose_0"]["kernel"].astype(jnp.float32),
                  p[name]["ConvTranspose_0"]["bias"].astype(jnp.float32)),
            "dc": dc(p[name]["DoubleConv_0"], s[name]["DoubleConv_0"]),
        }
    F["heads"] = {}
    for h in dense_heads:
        hp, hs = p[f"out_{h}"], s[f"out_{h}"]
        F["heads"][h] = {
            "c3": _fold(hp["Conv_0"], hp["BatchNorm_0"], hs["BatchNorm_0"]),
            "c1": (hp["Conv_1"]["kernel"].astype(jnp.float32),
                   hp["Conv_1"]["bias"].astype(jnp.float32)),
        }
    return F


_DN = ("NHWC", "HWIO", "NHWC")


def _conv_f(x, k, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k, (1, 1), "SAME", dimension_numbers=_DN)
    return y + b


def _convt_f(x, k, b):
    y = jax.lax.conv_transpose(
        x.astype(jnp.float32), k, (2, 2), "VALID", dimension_numbers=_DN)
    return y + b


class _Rec:
    """Per-site |x| maxima across calibration batches."""

    def __init__(self):
        self.amax: Dict[str, float] = {}

    def see(self, site: str, x) -> None:
        v = float(jnp.max(jnp.abs(x)))
        self.amax[site] = max(self.amax.get(site, 0.0), v)


def forward_folded(F: Dict, images: jnp.ndarray,
                   rec: Optional[_Rec] = None):
    """Float forward over the folded table. images: (B,H,W,1) f32.
    Returns ({head: logits}, features) — the sparse-serving contract."""
    see = rec.see if rec is not None else (lambda *_: None)

    def dcf(name, x):
        for i, (k, b) in enumerate(F[name] if isinstance(F[name], list)
                                   else F[name]["dc"]):
            see(f"{name}.{i}", x)
            x = jax.nn.relu(_conv_f(x, k, b))
        return x

    pool = lambda x: jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    see("in", images)
    x1 = dcf("inc2", dcf("inc1", images))
    x2 = dcf("down1", pool(x1))
    x3 = dcf("inc3", dcf("down2", pool(x2)))
    x4 = dcf("down3", pool(x3))
    x5 = dcf("down4", pool(x4))
    x6 = dcf("down5", pool(x5))

    def up(name, x, skip):
        kt, bt = F[name]["t"]
        see(f"{name}.t", x)
        x = _convt_f(x, kt, bt)
        x = _crop_or_pad_to(x, skip.shape[1], skip.shape[2])
        return dcf(name, jnp.concatenate([skip, x], axis=-1))

    y = up("up1", x6, x5)
    y = up("up2", y, x4)
    y = up("up3", y, x3)
    y = dcf("dconv2", dcf("dconv1", y))
    see("y", y)

    out = {}
    for h, hp in F["heads"].items():
        k3, b3 = hp["c3"]
        z = jax.nn.leaky_relu(_conv_f(y, k3, b3), negative_slope=0.01)
        k1, b1 = hp["c1"]
        out[h] = _conv_f(z, k1, b1)
    return out, y


def calibrate(F: Dict, images: np.ndarray, batch: int = 8) -> Dict[str, float]:
    """Per-site activation maxima over calibration images (eager)."""
    rec = _Rec()
    for i in range(0, len(images), batch):
        forward_folded(F, jnp.asarray(images[i:i + batch],
                                      jnp.float32), rec)
    return rec.amax


def quantize_folded(F: Dict, amax: Dict[str, float]) -> Dict:
    """int8 weights (per-output-channel scales) + per-site act scales."""
    def qw(k):
        sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
        kq = jnp.clip(jnp.round(k / sw), -127, 127).astype(jnp.int8)
        return kq, sw

    Q: Dict = {"scales": {k: max(v, 1e-12) / 127.0 for k, v in amax.items()}}
    # The input is a {0,1} ink mask: its scale is exact, not calibrated.
    Q["scales"]["in"] = 1.0 / 127.0
    for name in _DC_BLOCKS:
        Q[name] = [qw(k) + (b,) for k, b in F[name]]
    for name in _UPS:
        kt, bt = F[name]["t"]
        Q[name] = {"t": qw(kt) + (bt,),
                   "dc": [qw(k) + (b,) for k, b in F[name]["dc"]]}
    Q["heads"] = {h: {"c3": qw(hp["c3"][0]) + (hp["c3"][1],),
                      "c1": hp["c1"]}
                  for h, hp in F["heads"].items()}
    return Q


def forward_quant(Q: Dict, images: jnp.ndarray, carry=jnp.bfloat16):
    """int8 forward with the (heads, features) sparse-serving contract."""
    S = Q["scales"]

    def q8(x, s):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8)

    def conv_q(x, layer, site):
        kq, sw, b = layer
        y = jax.lax.conv_general_dilated(
            q8(x, S[site]), kq, (1, 1), "SAME", dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (S[site] * sw) + b

    def convt_q(x, layer, site):
        kq, sw, b = layer
        y = jax.lax.conv_transpose(
            q8(x, S[site]), kq, (2, 2), "VALID", dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (S[site] * sw) + b).astype(carry)

    def dcq(name, x):
        layers = Q[name] if isinstance(Q[name], list) else Q[name]["dc"]
        for i, layer in enumerate(layers):
            x = jax.nn.relu(conv_q(x, layer, f"{name}.{i}")).astype(carry)
        return x

    pool = lambda x: jax.lax.reduce_window(
        x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    x1 = dcq("inc2", dcq("inc1", images.astype(carry)))
    x2 = dcq("down1", pool(x1))
    x3 = dcq("inc3", dcq("down2", pool(x2)))
    x4 = dcq("down3", pool(x3))
    x5 = dcq("down4", pool(x4))
    x6 = dcq("down5", pool(x5))

    def up(name, x, skip):
        x = convt_q(x, Q[name]["t"], f"{name}.t")
        x = _crop_or_pad_to(x, skip.shape[1], skip.shape[2])
        return dcq(name, jnp.concatenate([skip, x], axis=-1))

    y = up("up1", x6, x5)
    y = up("up2", y, x4)
    y = up("up3", y, x3)
    y = dcq("dconv2", dcq("dconv1", y))

    out = {}
    for h, hp in Q["heads"].items():
        z = jax.nn.leaky_relu(conv_q(y, hp["c3"], "y"),
                              negative_slope=0.01)
        k1, b1 = hp["c1"]
        out[h] = _conv_f(z, k1, b1)
    return out, y


def prepare_quant(state, calib_images: np.ndarray,
                  dense_heads: Sequence[str] = ("atom_target",
                                                "bond_target")) -> Dict:
    """One-call PTQ: fold -> calibrate -> quantize, from a TrainState."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    F = fold_eval_params(variables, dense_heads)
    amax = calibrate(F, calib_images)
    return quantize_folded(F, amax)
