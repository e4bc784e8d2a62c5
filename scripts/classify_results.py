"""Bucket end-to-end decode failures from a results CSV.

Reuses the decode-ceiling classifier (scripts/decode_ceiling.py) on a
(smiles, smiles_pred) results file — the reference only reports scalar
accuracies (cal_acc.py:45-51); this splits the misses into structural
vs stereo vs decode/parse classes so the round report can say WHERE the
model loses molecules.

Usage: python scripts/classify_results.py results.csv [max_prints]
"""

import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))   # repo root (abcnet_tpu)
sys.path.insert(0, _here)                    # scripts (decode_ceiling)

import pandas as pd

from decode_ceiling import classify


def main():
    path = sys.argv[1]
    max_prints = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    df = pd.read_csv(path)
    buckets = {}
    fails = []
    for _, row in df.iterrows():
        truth = row["smiles"]
        pred = row.get("smiles_pred")
        if not isinstance(pred, str) or not pred:
            pred = None
        b = classify(truth, pred)
        buckets[b] = buckets.get(b, 0) + 1
        if b != "ok":
            fails.append((b, truth, pred))
    n = len(df)
    print(f"{buckets.get('ok', 0)}/{n} exact isomeric "
          f"({buckets.get('ok', 0) / max(n, 1):.3f})")
    for k in sorted(buckets):
        if k != "ok":
            print(f"  {k}: {buckets[k]}")
    for b, t, p in fails[:max_prints]:
        print(f"  FAIL [{b}]\n    T {t}\n    P {p}")


if __name__ == "__main__":
    main()
