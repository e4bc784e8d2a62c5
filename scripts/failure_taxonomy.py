"""Graph-level taxonomy of structural e2e failures from a results CSV.

classify_results.py says WHERE molecules are lost (struct vs stereo vs
decode); this says WHAT is wrong inside the struct bucket by diffing
the parsed molecular graphs (the reference has no analogue — it only
reports scalar accuracies, cal_acc.py:45-51):

  atoms+k/-k      heavy-atom count differs (detection miss/ghost)
  fragmented      pred splits into more components than truth (a missed
                  bond disconnected the graph)
  elem-swap X>Y   same heavy-atom count, element multiset differs
  bond-order      same formula+connectivity degree stats, kekule bond
                  order multiset differs (single/double/triple misread)
  connectivity    same formula and bond-order multiset, different graph
                  (a bond attached to the wrong atom)
  rings+k/-k      ring count differs (extra/missing cycle)
  charge          formal-charge totals differ
  hnum            explicit/implicit H totals differ (hnum misread)
  aromatic-form   aromatic atom count differs (dearomatized form read)

A failure can trip several axes; the FIRST matching axis in the order
above is the primary bucket (most-upstream cause), and every tripped
axis is counted in the per-axis table.

Usage: python scripts/failure_taxonomy.py results.csv [n_per_lineage]
"""

import os
import sys
from collections import Counter

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import pandas as pd

from abcnet_tpu.chem.smiles import from_smiles
from decode_ceiling import classify


def _components(mol):
    seen = [False] * mol.num_atoms
    n = 0
    for s in range(mol.num_atoms):
        if seen[s]:
            continue
        n += 1
        stack = [s]
        seen[s] = True
        while stack:
            i = stack.pop()
            for j in mol.neighbors(i):
                if not seen[j]:
                    seen[j] = True
                    stack.append(j)
    return n


def _stats(smiles):
    mol = from_smiles(smiles)
    elems = Counter(a.symbol for a in mol.atoms)
    orders = Counter(b.order for b in mol.bonds)
    return {
        "mol": mol,
        "elems": elems,
        "n_atoms": mol.num_atoms,
        "orders": orders,
        "comps": _components(mol),
        "rings": mol.num_bonds - mol.num_atoms + _components(mol),
        "charge": sum(a.charge for a in mol.atoms),
        "hs": sum(a.total_hs for a in mol.atoms),
        "arom": sum(1 for a in mol.atoms if a.aromatic),
    }


def _swap_label(te, pe):
    lost = te - pe       # in truth, not in pred
    gained = pe - te     # in pred, not in truth
    pairs = []
    for (sym_l, n_l), (sym_g, n_g) in zip(sorted(lost.items()),
                                          sorted(gained.items())):
        pairs.append(f"{sym_l}>{sym_g}")
    return ",".join(pairs) if pairs else "?"


def diff_axes(truth, pred):
    """Ordered (axis, detail) list of every failing comparison axis."""
    t, p = _stats(truth), _stats(pred)
    axes = []
    if t["n_atoms"] != p["n_atoms"]:
        d = p["n_atoms"] - t["n_atoms"]
        axes.append((f"atoms{d:+d}", ""))
    if p["comps"] > t["comps"]:
        axes.append(("fragmented", f"{t['comps']}->{p['comps']}"))
    if t["n_atoms"] == p["n_atoms"] and t["elems"] != p["elems"]:
        axes.append(("elem-swap", _swap_label(t["elems"], p["elems"])))
    if t["orders"] != p["orders"]:
        lo = sorted((t["orders"] - p["orders"]).elements())
        hi = sorted((p["orders"] - t["orders"]).elements())
        axes.append(("bond-order", f"{lo}->{hi}"))
    if t["rings"] != p["rings"]:
        axes.append((f"rings{p['rings'] - t['rings']:+d}", ""))
    if t["charge"] != p["charge"]:
        axes.append(("charge", f"{t['charge']}->{p['charge']}"))
    if t["hs"] != p["hs"]:
        axes.append(("hnum", f"{t['hs']}->{p['hs']}"))
    if t["arom"] != p["arom"]:
        axes.append(("aromatic-form", f"{t['arom']}->{p['arom']}"))
    if not axes:
        # Identical multiset stats on every axis -> pure connectivity.
        axes.append(("connectivity", ""))
    return axes


def main():
    path = sys.argv[1]
    n_lin = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    df = pd.read_csv(path)
    lineages = {}
    for i, row in df.iterrows():
        lin = "rdkit" if i < n_lin else "indigo"
        truth = row["smiles"]
        pred = row.get("smiles_pred")
        if not isinstance(pred, str) or not pred:
            pred = None
        b = classify(truth, pred)
        if b != "struct":
            continue
        try:
            axes = diff_axes(truth, pred)
        except Exception as e:
            axes = [(f"parse:{type(e).__name__}", "")]
        rec = lineages.setdefault(lin, {"primary": Counter(),
                                        "all": Counter(),
                                        "details": Counter(),
                                        "n": 0,
                                        "examples": []})
        rec["n"] += 1
        rec["primary"][axes[0][0]] += 1
        for ax, detail in axes:
            rec["all"][ax] += 1
            if detail:
                rec["details"][f"{ax}:{detail}"] += 1
        if len(rec["examples"]) < 6:
            rec["examples"].append((axes, truth, pred))

    for lin, rec in lineages.items():
        print(f"== {lin}: {rec['n']} struct failures ==")
        print("  primary buckets:")
        for k, v in rec["primary"].most_common():
            print(f"    {k:16s} {v}")
        print("  all tripped axes:")
        for k, v in rec["all"].most_common():
            print(f"    {k:16s} {v}")
        print("  top details:")
        for k, v in rec["details"].most_common(12):
            print(f"    {k:28s} {v}")
        for axes, t, p in rec["examples"]:
            print(f"  EX {axes}\n    T {t}\n    P {p}")


if __name__ == "__main__":
    main()
