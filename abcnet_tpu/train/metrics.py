"""Training/eval metric suite, fully in-XLA.

Metric definitions mirror the reference's AverageMeter suite
(/root/reference/src/train.py:143-215) — they are the comparison surface
against the retained training logs (BASELINE.md):

  * atom/bond detection precision/recall after 3x3 max-pool NMS at
    threshold 0.25, exact-cell and 3x3-tolerance ("precision3/recall3")
  * type/charge/hs accuracy at GT peak cells
  * rho MAE over bond-mass cells
  * omega precision/recall via circular (wrap-padded) 1-D NMS

TPU-first departure: every metric returns (numerator-sum, weight) pairs
and stays on device; the reference's per-step ``.cpu().detach().numpy()``
sync storm (SURVEY.md section 3.1) is replaced by fetching accumulated
scalars every N steps.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..data import vocab
from ..ops.losses import activations

NO = vocab.NUM_OMEGA_BINS


def maxpool2d_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME max pool over (B, H, W, C)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")


def nms_mask(p: jnp.ndarray, threshold: float = 0.25) -> jnp.ndarray:
    """Local-maximum mask (train.py:145-151)."""
    pooled = maxpool2d_same(p)
    return ((pooled == p) & (p > threshold)).astype(jnp.float32)


def circular_nms_mask(p: jnp.ndarray, threshold: float = 0.25) -> jnp.ndarray:
    """Circular 1-D NMS over the omega axis (train.py:190-193).
    p: (B, H, W, 60)."""
    padded = jnp.concatenate([p[..., -1:], p, p[..., :1]], axis=-1)
    pooled = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max, (1, 1, 1, 3), (1, 1, 1, 1), "VALID")
    return ((pooled == p) & (p > threshold)).astype(jnp.float32)


def circular_dilate(m: jnp.ndarray) -> jnp.ndarray:
    padded = jnp.concatenate([m[..., -1:], m, m[..., :1]], axis=-1)
    return jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max, (1, 1, 1, 3), (1, 1, 1, 1), "VALID")


def _pr(pred_mask, true_mask) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    tp = jnp.sum(pred_mask * true_mask)
    tp3_p = jnp.sum(pred_mask * maxpool2d_same(true_mask))
    tp3_r = jnp.sum(true_mask * maxpool2d_same(pred_mask))
    np_ = jnp.sum(pred_mask)
    nt = jnp.sum(true_mask)
    return {
        "precision": (tp, np_),
        "recall": (tp, nt),
        "precision3": (tp3_p, np_),
        "recall3": (tp3_r, nt),
    }


def _acc_at_peaks(p, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accuracy at labeled cells: sum_c t weighting (train.py:164-171)."""
    cell_mass = jnp.sum(t, axis=-1)
    hit = (jnp.argmax(t, axis=-1) == jnp.argmax(p, axis=-1)).astype(
        jnp.float32)
    return jnp.sum(cell_mass * hit), jnp.sum(cell_mass)


def compute_metrics(preds: Dict[str, jnp.ndarray],
                    targets_nhwc: Dict[str, jnp.ndarray],
                    threshold: float = 0.25) -> Dict[str, Tuple]:
    """Returns dict name -> (numerator, denominator) device scalars."""
    act = activations(preds)
    t = targets_nhwc

    out: Dict[str, Tuple] = {}

    atom_true = (t["atom_target"] == 1.0).astype(jnp.float32)
    atom_pred = nms_mask(act["atom_target"], threshold)
    for k, v in _pr(atom_pred, atom_true).items():
        out[f"atom_target_{k}"] = v

    bond_true = (t["bond_target"] == 1.0).astype(jnp.float32)
    bond_pred = nms_mask(act["bond_target"], threshold)
    for k, v in _pr(bond_pred, bond_true).items():
        out[f"bond_target_{k}"] = v

    # Peak-count health signals (per image): denominator starvation in
    # the P/R ratios above is invisible once averaged — e.g. a train-mode
    # forward whose heatmaps rarely clear the threshold quantizes
    # precision to n/tiny-count. Surfacing predicted-vs-true peak counts
    # makes that failure mode readable in the logs.
    n_img = jnp.asarray(atom_true.shape[0], jnp.float32)
    out["atom_peaks_per_img"] = (jnp.sum(atom_pred), n_img)
    out["atom_true_per_img"] = (jnp.sum(atom_true), n_img)
    out["bond_peaks_per_img"] = (jnp.sum(bond_pred), n_img)
    out["bond_true_per_img"] = (jnp.sum(bond_true), n_img)

    out["atom_types_acc"] = _acc_at_peaks(act["atom_type"], t["atom_type"])
    out["atom_charges_acc"] = _acc_at_peaks(act["atom_charge"],
                                            t["atom_charge"])
    # Raw (num, den): when no atom carries an hnum target (pure-carbon
    # rdkit-lineage evals), averages() omits the metric instead of
    # printing a misleading 0.0000 (the +0.01 denominator pad this used
    # to carry defeated that omission; the reference's +0.1 pad lives in
    # the LOSS, ops/losses.py, where it belongs).
    out["atom_hs_acc"] = _acc_at_peaks(act["atom_hs"], t["atom_hs"])

    # Bond type accuracy at labeled (omega, x, y) cells. With the fused
    # target representation the dense 6-way target exists only when
    # requested; callers include it for eval batches.
    if "bond_type" in t:
        bt = t["bond_type"]                     # (B, G, G, 6, 60)
        cell_mass = jnp.sum(bt, axis=-2)        # (B, G, G, 60)
        hit = (jnp.argmax(bt, axis=-2) ==
               jnp.argmax(act["bond_type"], axis=-2)).astype(jnp.float32)
        out["bond_types_acc"] = (jnp.sum(cell_mass * hit),
                                 jnp.sum(cell_mass))

    mass = t["bond_type_mass"]
    out["bond_rhos_mae"] = (
        jnp.sum(jnp.abs(act["bond_rho"] - t["bond_rho"]) * mass),
        jnp.sum(mass))

    omega_true = (t["bond_omega"] == 1.0).astype(jnp.float32)
    omega_pred = circular_nms_mask(act["bond_omega"], threshold) * bond_true
    tp = jnp.sum(omega_true * omega_pred)
    np_ = jnp.sum(omega_pred)
    nt = jnp.sum(omega_true)
    out["bond_omega_precision"] = (tp, np_)
    out["bond_omega_recall"] = (tp, nt)
    out["bond_omega_precision3"] = (
        jnp.sum(circular_dilate(omega_true) * omega_pred), np_)
    out["bond_omega_recall3"] = (
        jnp.sum(omega_true * circular_dilate(omega_pred)), nt)
    return out


class MeterBank:
    """Accumulator for (numerator, denominator) metric pairs — the
    AverageMeter equivalent (reference src/meter.py).

    `update` adds device scalars with asynchronous jnp ops (no host
    sync); the single blocking `device_get` happens in `averages()`,
    i.e. once per logging interval. The reference fetches every scalar
    to host every step (`.cpu().detach().numpy()`, train.py:145-215) —
    a per-step sync storm this design removes.
    """

    def __init__(self):
        self.num: Dict[str, object] = {}
        self.den: Dict[str, object] = {}

    def update(self, metrics: Dict[str, Tuple]) -> None:
        for k, (n, d) in metrics.items():
            if k in self.num:
                self.num[k] = self.num[k] + n
                self.den[k] = self.den[k] + d
            else:
                self.num[k] = n
                self.den[k] = d

    def averages(self) -> Dict[str, float]:
        """One blocking fetch; metrics whose denominator never fired are
        OMITTED (e.g. atom_hs on an rdkit-lineage eval where no hetero
        aromatic atom appears) — printing them as 0.0000 misreads as a
        broken model."""
        host_num = jax.device_get(self.num)
        host_den = jax.device_get(self.den)
        return {k: float(host_num[k]) / float(host_den[k])
                for k in host_num if float(host_den[k])}

    def reset(self) -> None:
        self.num.clear()
        self.den.clear()
