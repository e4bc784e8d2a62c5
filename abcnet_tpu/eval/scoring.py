"""End-to-end SMILES scoring — parity with the reference's cal_acc.py.

The reference computes three numbers over (smiles, smiles_pred) pairs
(/root/reference/src/cal_acc.py:13-51):
  1. exact match after tautomer canonicalization of both sides
  2. exact match of canonical non-isomeric SMILES
  3. mean Morgan(radius 3) Dice similarity

This framework scores with its own chem stack (no RDKit): all three
metrics are reproduced — metric 1 through chem.tautomer's miniature of
the MolStandardize enumerator (keto/enol, amide/iminol, azole NH; see
its module docstring for scope).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from ..chem import canonical_smiles, from_smiles
from ..chem.fingerprint import morgan_dice
from ..chem.tautomer import canonicalize_tautomer_smiles


@dataclass
class ScoreReport:
    n: int
    n_decoded: int
    exact_match: float           # metric 1: tautomer-insensitive exact
    exact_match_canonical: float  # metric 2: NON-isomeric canonical exact
    tanimoto_like: float         # metric 3: mean Morgan-Dice
    decode_rate: float
    exact_match_isomeric: float = 0.0  # extra: isomeric canonical exact

    def __str__(self) -> str:
        return (f"n={self.n} decoded={self.n_decoded} "
                f"exact={self.exact_match:.4f} "
                f"exact_canonical={self.exact_match_canonical:.4f} "
                f"exact_isomeric={self.exact_match_isomeric:.4f} "
                f"dice={self.tanimoto_like:.4f} "
                f"decode_rate={self.decode_rate:.4f}")


def score_pairs(truths: Sequence[str],
                preds: Sequence[Optional[str]]) -> ScoreReport:
    """The three cal_acc.py counters, computed independently per pair:
    metric 2 compares NON-isomeric canonicals (stereo stripped,
    cal_acc.py:35-36); the isomeric comparison is reported as an extra
    (stricter) column since this framework decodes stereo."""
    assert len(truths) == len(preds)
    n = len(truths)
    hits_taut = 0
    hits_noniso = 0
    hits_iso = 0
    dice_sum = 0.0
    decoded = 0
    for truth, pred in zip(truths, preds):
        if pred is None:
            continue
        decoded += 1
        try:
            iso_eq = canonical_smiles(truth) == canonical_smiles(pred)
            noniso_eq = (canonical_smiles(truth, isomeric=False)
                         == canonical_smiles(pred, isomeric=False))
        except Exception:
            continue
        hits_iso += iso_eq
        hits_noniso += noniso_eq
        if iso_eq:
            hits_taut += 1
            dice_sum += 1.0
            continue
        tt = canonicalize_tautomer_smiles(truth)
        tp = canonicalize_tautomer_smiles(pred)
        if tt is not None and tt == tp:
            hits_taut += 1
            dice_sum += 1.0
            continue
        try:
            dice_sum += morgan_dice(from_smiles(truth), from_smiles(pred))
        except Exception:
            pass
    # All rates divide by n (total pairs), NOT by the decoded count —
    # deliberate reference parity: cal_acc.py:45-51 averages over every
    # row, so an undecodable image counts as a miss, and the Dice mean
    # treats it as similarity 0.
    return ScoreReport(
        n=n, n_decoded=decoded,
        exact_match=hits_taut / n if n else 0.0,
        exact_match_canonical=hits_noniso / n if n else 0.0,
        tanimoto_like=dice_sum / n if n else 0.0,
        decode_rate=decoded / n if n else 0.0,
        exact_match_isomeric=hits_iso / n if n else 0.0,
    )


def write_results_csv(path: str, truths: Sequence[str],
                      preds: Sequence[Optional[str]]) -> None:
    """results/results.csv parity (img2smiles2.py:342-344)."""
    import pandas as pd
    df = pd.DataFrame({"smiles": list(truths),
                       "smiles_pred": ["" if p is None else p
                                       for p in preds]})
    df.to_csv(path)
