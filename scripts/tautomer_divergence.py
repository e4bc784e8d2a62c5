"""Bound the tautomer-metric divergence empirically (VERDICT r3 #8).

Metric 1 (exact match after tautomer canonicalization, the reference's
cal_acc.py:20-31 via RDKit MolStandardize) is only as good as the
enumerator behind it. Two measurable error surfaces:

  1. CONSISTENCY: for every tautomer T the enumerator itself reaches
     from molecule M, canonical_tautomer(T) must equal
     canonical_tautomer(M) — an inconsistency means two tautomeric
     depictions of the same molecule would score as a mismatch
     (a false negative metric 1 cannot have under a perfect
     enumerator).
  2. RELEVANCE: how often canonicalization changes the SMILES at all
     (the rate at which metric 1 can differ from plain isomeric exact
     match on this corpus).

Usage: python scripts/tautomer_divergence.py [n_molecules]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abcnet_tpu.chem import from_smiles, to_smiles
from abcnet_tpu.chem.random_mol import random_molecule
from abcnet_tpu.chem.tautomer import _enumerate, canonical_tautomer

CHECK_PER_MOL = 4   # consistency probes per molecule (cost cap)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    rng = random.Random(424242)
    t0 = time.time()
    total = 0
    changed = 0            # canonicalization altered the SMILES
    multi = 0              # >1 tautomer reachable
    inconsistent = 0       # some reachable tautomer canonicalizes away
    inconsistent_examples = []
    tautomer_states = 0
    while total < n:
        mol = random_molecule(rng, max_atoms=28)
        try:
            smi = to_smiles(mol, canonical=True)
            best, seen = _enumerate(mol)
            canon = to_smiles(best, canonical=True) if best else smi
        except Exception:
            continue
        total += 1
        if canon != smi:
            changed += 1
        tautomer_states += len(seen)
        if len(seen) > 1:
            multi += 1
            bad = None
            others = sorted(t for t in seen if t != smi)
            for t in rng.sample(others, min(CHECK_PER_MOL, len(others))):
                try:
                    tm = from_smiles(t)
                    tc = to_smiles(canonical_tautomer(tm), canonical=True)
                except Exception:
                    continue
                if tc != canon:
                    bad = (t, tc)
                    break
            if bad is not None:
                inconsistent += 1
                if len(inconsistent_examples) < 20:
                    inconsistent_examples.append((smi, canon) + bad)
        if total % 1000 == 0:
            print(f"{total}/{n} changed={changed} multi={multi} "
                  f"inconsistent={inconsistent} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"\nRESULT n={total}")
    print(f"  canonicalization changed SMILES: {changed} "
          f"({changed / total:.4f})")
    print(f"  molecules with >1 reachable tautomer: {multi} "
          f"({multi / total:.4f})")
    print(f"  mean reachable tautomers: {tautomer_states / total:.2f}")
    print(f"  INCONSISTENT (metric-1 false-negative surface): "
          f"{inconsistent} ({inconsistent / total:.5f})")
    for ex in inconsistent_examples:
        print("   e.g. mol=%s canon=%s tautomer=%s its_canon=%s" % ex)


if __name__ == "__main__":
    main()
