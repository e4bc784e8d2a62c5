"""Penalty-reduced focal losses under learned uncertainty weighting.

Math parity with the reference training loop
(/root/reference/src/train.py:95-137):

  * heatmaps (atom/bond): CenterNet focal
      -(t==1)(1-p)^2 log p - (1-t)^4 p^2 log(1-p), normalized by #peaks
  * type/charge/hs: focal CE  -w_c t (1-p)^2 log p / sum(t)
    with the rare-element weight vector on atom types (train.py:16)
  * rho: L1 masked by bond-type mass
  * omega: circular multi-label focal BCE weighted by per-cell omega mass
  * every term scaled by exp(-s_i) + s_i with the learned s vector
    (indices 5 and 8 unused, rho scaled by 0.5*exp(-s6)+s6)

Two bond-type implementations:
  * dense: consumes the full (6,60,128,128) target (golden tests/eval)
  * fused: gathers log-softmax at labeled halo cells only — the focal CE
    over bond types has no negative term, so the dense tensor
    (1.5 GB per batch-64 in the reference) never needs to exist.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import vocab
from .targets import _OFF3, _CENTER3

EPS_CLAMP = 1e-5
G = vocab.GRID
NO = vocab.NUM_OMEGA_BINS
NB = vocab.NUM_BOND_CLASSES


def _clamp(p):
    return jnp.clip(p, EPS_CLAMP, 1.0 - EPS_CLAMP)


def activations(preds: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Head activations (train.py:95-105). preds are NHWC logits
    (possibly bf16 straight off the heads — upcast here so the loss/
    metric math runs in f32 exactly as before); outputs keep NHWC with
    class axes last (bond_type -> (B,H,W,6,60))."""
    f32 = lambda name: preds[name].astype(jnp.float32)
    out = {}
    out["atom_target"] = _clamp(jax.nn.sigmoid(f32("atom_target")))
    out["atom_type"] = _clamp(jax.nn.softmax(f32("atom_type"), axis=-1))
    out["atom_charge"] = _clamp(jax.nn.softmax(f32("atom_charge"), axis=-1))
    out["atom_hs"] = _clamp(jax.nn.softmax(f32("atom_hs"), axis=-1))
    out["bond_target"] = _clamp(jax.nn.sigmoid(f32("bond_target")))
    bt = f32("bond_type")
    bt = bt.reshape(bt.shape[:-1] + (NB, NO))
    out["bond_type"] = _clamp(jax.nn.softmax(bt, axis=-2))
    out["bond_omega"] = _clamp(jax.nn.sigmoid(f32("bond_omega")))
    out["bond_rho"] = jnp.abs(f32("bond_rho"))
    return out


def heatmap_focal(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """CenterNet penalty-reduced focal (train.py:107-108)."""
    pos = (t == 1.0).astype(p.dtype)
    loss = jnp.sum(-pos * (1 - p) ** 2 * jnp.log(p)
                   - (1 - t) ** 4 * p ** 2 * jnp.log(1 - p))
    return loss / jnp.maximum(jnp.sum(pos), 1.0)


def class_focal(p: jnp.ndarray, t: jnp.ndarray, weights=None,
                denom_eps: float = 0.0) -> jnp.ndarray:
    """Focal CE -w t (1-p)^2 log p / (sum t + eps)  (train.py:109-114)."""
    term = -t * (1 - p) ** 2 * jnp.log(p)
    if weights is not None:
        term = term * weights
    return jnp.sum(term) / (jnp.sum(t) + denom_eps
                            if denom_eps else jnp.maximum(jnp.sum(t), 1e-6))


def omega_focal(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Circular multi-label focal BCE, masked to bond cells via per-cell
    omega mass (train.py:124-125). p, t: (B, H, W, 60)."""
    mass = jnp.sum(t, axis=-1, keepdims=True)
    pos = (t == 1.0).astype(p.dtype)
    inner = (pos * (1 - p) ** 2 * jnp.log(p)
             + (1 - t) ** 4 * p ** 2 * jnp.log(1 - p))
    return -jnp.sum(mass * inner) / jnp.maximum(jnp.sum(t), 1e-6)


def rho_l1(pred: jnp.ndarray, rho_t: jnp.ndarray,
           mass: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 (train.py:121); mass = sum over classes of bond_type."""
    return jnp.sum(jnp.abs(pred - rho_t) * mass) / jnp.maximum(
        jnp.sum(mass), 1e-6)


_ATOM_W = np.asarray(vocab.ATOM_TYPE_WEIGHTS, np.float32)


def set_atom_type_weights(weights) -> None:
    """Override the per-class atom-type focal weights for subsequent
    traces of compute_losses (call BEFORE the first jitted train step).

    The reference hardcodes (1,.1,.1,.1,1,...,10x5) (train.py:16); the
    round-4 failure taxonomy showed the 0.1 down-weighting of C/N/O
    under-commits the model on the majority classes (elem-swap bucket:
    C->P, N->P, N->S over-predictions, logs/failure_taxonomy_r4.log),
    so round-5 training recalibrates. Default stays reference parity.
    """
    global _ATOM_W
    w = np.asarray(weights, np.float32)
    assert w.shape == (vocab.NUM_ATOM_CLASSES,), w.shape
    _ATOM_W = w


def _to_nhwc_targets(targets: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Scatter targets are channel-first (reference layout); heads are
    NHWC. Transpose once here."""
    out = {}
    out["atom_target"] = jnp.transpose(targets["atom_target"], (0, 2, 3, 1))
    out["atom_type"] = jnp.transpose(targets["atom_type"], (0, 2, 3, 1))
    out["atom_charge"] = jnp.transpose(targets["atom_charge"], (0, 2, 3, 1))
    out["atom_hs"] = jnp.transpose(targets["atom_hs"], (0, 2, 3, 1))
    out["bond_target"] = jnp.transpose(targets["bond_target"], (0, 2, 3, 1))
    out["bond_omega"] = jnp.transpose(targets["bond_omega"], (0, 2, 3, 1))
    out["bond_rho"] = jnp.transpose(targets["bond_rho"], (0, 2, 3, 1))
    out["bond_type_mass"] = jnp.transpose(targets["bond_type_mass"],
                                          (0, 2, 3, 1))
    if "bond_type" in targets:
        # (B, 6, 60, G, G) -> (B, G, G, 6, 60)
        out["bond_type"] = jnp.transpose(targets["bond_type"],
                                         (0, 3, 4, 1, 2))
    return out


def compute_losses(preds: Dict[str, jnp.ndarray],
                   targets: Dict[str, jnp.ndarray],
                   batch: Dict[str, jnp.ndarray] = None,
                   fused_bond_type: bool = True) -> Dict[str, jnp.ndarray]:
    """All eight loss terms. ``targets`` are scatter-built channel-first
    maps; ``batch`` (compact labels) is required for the fused bond-type
    path."""
    act = activations(preds)
    t = _to_nhwc_targets(targets)

    losses = {}
    losses["atom_target"] = heatmap_focal(act["atom_target"],
                                          t["atom_target"])
    losses["bond_target"] = heatmap_focal(act["bond_target"],
                                          t["bond_target"])
    losses["atom_type"] = class_focal(
        act["atom_type"], t["atom_type"],
        weights=jnp.asarray(_ATOM_W)[None, None, None, :])
    losses["atom_charge"] = class_focal(act["atom_charge"], t["atom_charge"])
    losses["atom_hs"] = class_focal(act["atom_hs"], t["atom_hs"],
                                    denom_eps=0.1)
    losses["bond_omega"] = omega_focal(act["bond_omega"], t["bond_omega"])
    losses["bond_rho"] = rho_l1(act["bond_rho"], t["bond_rho"],
                                t["bond_type_mass"])

    if fused_bond_type:
        assert batch is not None, "fused bond-type loss needs compact labels"
        losses["bond_type"] = fused_bond_type_loss(preds["bond_type"], batch)
    else:
        losses["bond_type"] = class_focal(act["bond_type"], t["bond_type"])
    return losses


def fused_bond_type_loss(bond_type_logits: jnp.ndarray,
                         batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Gather-based focal CE over bond types.

    The dense loss is -sum t (1-p)^2 log p / sum t with t nonzero only on
    the 27-cell halos of each labeled (type, omega, x, y). We gather the
    6-way log-softmax at exactly those cells. Divergence from dense:
    overlapping halos of *different* bonds double-count (rare; the dense
    overwrite keeps one); spatial out-of-bounds cells are masked like the
    reference's slice clamping.
    """
    B, Gh, Gw = bond_type_logits.shape[:3]
    logits = bond_type_logits.reshape(B, Gh, Gw, NB, NO)

    off = jnp.asarray(_OFF3)                             # (27, 3)
    center = jnp.asarray(_CENTER3).astype(jnp.float32)   # (27,)

    def per_sample(lg, bonds_i, n_bonds):
        Bn = bonds_i.shape[0]
        valid = (jnp.arange(Bn) < n_bonds).astype(jnp.float32)  # (Bn,)
        x = bonds_i[:, 0]
        y = bonds_i[:, 1]
        c = bonds_i[:, 2]
        o = bonds_i[:, 3]
        ho = jnp.mod(o[:, None] + off[None, :, 0], NO)           # (Bn,27)
        hx = x[:, None] + off[None, :, 1]
        hy = y[:, None] + off[None, :, 2]
        inb = ((hx >= 0) & (hx < Gh) & (hy >= 0) & (hy < Gw)).astype(
            jnp.float32)
        hxc = jnp.clip(hx, 0, Gh - 1)
        hyc = jnp.clip(hy, 0, Gw - 1)
        # Gather the 6-class logit vectors at the labeled cells FIRST,
        # then log-softmax on the tiny (Bn, 27, 6) slice. A full-map
        # log_softmax materializes (and back-propagates through) the
        # (G, G, 6, 60) tensor — ~1.5 GB/batch of pure bandwidth that
        # profiled at ~157 ms of the train step; the loss only ever
        # reads these cells. Identical math.
        vecs = lg[hxc, hyc, :, ho].astype(jnp.float32)           # (Bn,27,6)
        lp_vec = jax.nn.log_softmax(vecs, axis=-1)
        lp = jnp.take_along_axis(lp_vec, c[:, None, None],
                                 axis=-1)[..., 0]                # (Bn,27)
        p = jnp.exp(lp)
        tvals = jnp.where(center[None, :] > 0, 1.0, 0.5)
        tvals = tvals * inb * valid[:, None]
        loss = jnp.sum(-tvals * (1 - p) ** 2 * lp)
        return loss, jnp.sum(tvals)

    losses, masses = jax.vmap(per_sample)(logits, batch["bonds_i"],
                                          batch["n_bonds"])
    return jnp.sum(losses) / jnp.maximum(jnp.sum(masses), 1e-6)


# Uncertainty weighting (train.py:127-137). s has 10 entries; the mapping
# below reproduces the reference index assignment exactly.
S_INDEX = {"atom_target": 0, "bond_target": 1, "atom_type": 2,
           "atom_charge": 3, "bond_type": 4, "bond_rho": 6,
           "bond_omega": 7, "atom_hs": 9}


def total_loss(losses: Dict[str, jnp.ndarray],
               s: jnp.ndarray) -> jnp.ndarray:
    total = 0.0
    for name, idx in S_INDEX.items():
        scale = jnp.exp(-s[idx]) + s[idx]
        if name == "bond_rho":
            scale = 0.5 * jnp.exp(-s[idx]) + s[idx]
        total = total + losses[name] * scale
    return total
