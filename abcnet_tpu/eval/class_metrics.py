"""Per-class precision/recall tables — test_accuracy.py parity.

The reference accumulates per-class tp/fp/fn for the 14 atom classes,
3 charge classes and 6 bond classes with a 3x3 spatial tolerance
(/root/reference/src/test_accuracy.py:32-186) by looping over peaks on
host. Here the counts are computed as dense masked reductions in XLA
and fetched as (num, den) vectors.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..data import vocab
from ..ops.losses import activations
from ..train.metrics import maxpool2d_same, nms_mask


def _per_class_pr(pred_peaks: jnp.ndarray, pred_cls: jnp.ndarray,
                  true_peaks: jnp.ndarray, true_cls: jnp.ndarray,
                  n_classes: int):
    """pred_peaks/true_peaks: (B, H, W) {0,1}; *_cls: (B, H, W) int.

    tp (precision side): predicted peak of class c with a true peak of
    class c in its 3x3 neighborhood; recall side symmetric — matching
    the reference's tolerant counting (test_accuracy.py:128-186).
    """
    tps_p = []
    tps_r = []
    nps = []
    nts = []
    for c in range(n_classes):
        p_c = pred_peaks * (pred_cls == c)
        t_c = true_peaks * (true_cls == c)
        t_dil = maxpool2d_same(t_c[..., None])[..., 0]
        p_dil = maxpool2d_same(p_c[..., None])[..., 0]
        tps_p.append(jnp.sum(p_c * t_dil))
        tps_r.append(jnp.sum(t_c * p_dil))
        nps.append(jnp.sum(p_c))
        nts.append(jnp.sum(t_c))
    return (jnp.stack(tps_p), jnp.stack(nps),
            jnp.stack(tps_r), jnp.stack(nts))


@jax.jit
def per_class_counts(preds: Dict[str, jnp.ndarray],
                     targets_nhwc: Dict[str, jnp.ndarray],
                     threshold: float = 0.25) -> Dict[str, jnp.ndarray]:
    """Returns per-class (tp_p, np, tp_r, nt) count vectors on device."""
    act = activations(preds)
    t = targets_nhwc

    out = {}

    atom_pred_peaks = nms_mask(act["atom_target"], threshold)[..., 0]
    atom_true_peaks = (t["atom_target"][..., 0] == 1.0).astype(jnp.float32)
    pc = jnp.argmax(act["atom_type"], axis=-1)
    tc = jnp.argmax(t["atom_type"], axis=-1)
    out["atom_type"] = _per_class_pr(atom_pred_peaks, pc,
                                     atom_true_peaks, tc,
                                     vocab.NUM_ATOM_CLASSES)
    pc = jnp.argmax(act["atom_charge"], axis=-1)
    tc = jnp.argmax(t["atom_charge"], axis=-1)
    out["atom_charge"] = _per_class_pr(atom_pred_peaks, pc,
                                       atom_true_peaks, tc,
                                       vocab.NUM_CHARGE_CLASSES)

    # Bond classes: class at the peak cell's strongest omega bin.
    bond_pred_peaks = nms_mask(act["bond_target"], threshold)[..., 0]
    bond_true_peaks = (t["bond_target"][..., 0] == 1.0).astype(jnp.float32)
    if "bond_type" in t:
        omega_best_t = jnp.argmax(jnp.sum(t["bond_type"], axis=-2), axis=-1)
        omega_best_p = jnp.argmax(act["bond_omega"], axis=-1)
        tc = jnp.take_along_axis(
            jnp.argmax(t["bond_type"], axis=-2),
            omega_best_t[..., None], axis=-1)[..., 0]
        pc = jnp.take_along_axis(
            jnp.argmax(act["bond_type"], axis=-2),
            omega_best_p[..., None], axis=-1)[..., 0]
        out["bond_type"] = _per_class_pr(bond_pred_peaks, pc,
                                         bond_true_peaks, tc,
                                         vocab.NUM_BOND_CLASSES)
    return out


def per_class_report(counts: Dict[str, Tuple]) -> str:
    """Format accumulated count vectors into the reference's printed
    precision/recall tables (test_accuracy.py:271-339)."""
    names = {
        "atom_type": list(vocab.ATOM_VOCAB.keys()),
        "atom_charge": ["0", "+1", "-1"],
        "bond_type": ["single", "double", "triple", "aromatic",
                      "wedge", "hash"],
    }
    lines = []
    for group, (tp_p, np_, tp_r, nt) in counts.items():
        lines.append(f"== {group} ==")
        for c, label in enumerate(names.get(group, [])):
            prec = float(tp_p[c]) / max(float(np_[c]), 1e-9)
            rec = float(tp_r[c]) / max(float(nt[c]), 1e-9)
            lines.append(f"  {label:<10s} precision={prec:.4f} "
                         f"recall={rec:.4f} n={int(nt[c])}")
    return "\n".join(lines)
