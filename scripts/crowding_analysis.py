"""Quantify the stride-4 cell-collision mechanism (VERDICT r3 next #6).

The stride-2 detection-head hypothesis says mixed-corpus misses come
from crowded regions. Before spending a chip A/B budget on it, measure
the part of the mechanism that is *irrecoverable* at stride 4: two
atoms (or two bond centers) landing in the same grid cell. The target
encoder overwrites sequentially (src/utils.py:83-228 semantics), and
the decoder emits at most one atom and one bond per peak cell
(infer/decode.py), so every collision is a guaranteed structural error
regardless of training — an exact-match ceiling of
1 - P(molecule has >= 1 collision).

Prints per-corpus (mixed vs refcond) at stride 4 and stride 2:
  atom-cell / bond-cell collision rates per molecule, the implied
  exact ceiling, and the min pairwise atom distance distribution.

Usage: python scripts/crowding_analysis.py [n=2000]
"""

import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from abcnet_tpu.data.encode import parse_atoms_string, parse_bonds_string
from abcnet_tpu.data.generate import generate_sample


def collisions(px_xy, stride):
    cells = Counter((int(x) // stride, int(y) // stride) for x, y in px_xy)
    return sum(c - 1 for c in cells.values())


def sweep(name, n, **gen_kw):
    rng = random.Random(4242)
    stats = {s: {"atom_mols": 0, "bond_mols": 0, "atom_cells": 0,
                 "bond_cells": 0} for s in (4, 2)}
    min_d = []
    got = 0
    while got < n:
        s = generate_sample(rng, **gen_kw)
        if s is None:
            continue
        got += 1
        atoms = parse_atoms_string(s.atoms_string)
        bonds = parse_bonds_string(s.bonds_string)
        axy = [(a.x, a.y) for a in atoms]
        bxy = [(b.x, b.y) for b in bonds]
        for stride in (4, 2):
            ac = collisions(axy, stride)
            bc = collisions(bxy, stride)
            stats[stride]["atom_cells"] += ac
            stats[stride]["bond_cells"] += bc
            stats[stride]["atom_mols"] += ac > 0
            stats[stride]["bond_mols"] += bc > 0
        if len(axy) > 1:
            p = np.asarray(axy, np.float64)
            d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            min_d.append(float(d.min()))
    md = np.asarray(min_d)
    print(f"== {name} (n={got}) ==", flush=True)
    for stride in (4, 2):
        st = stats[stride]
        print(f"  stride {stride}: atom-collision mols "
              f"{st['atom_mols']/got:.4f} ({st['atom_cells']} cells), "
              f"bond-collision mols {st['bond_mols']/got:.4f} "
              f"({st['bond_cells']} cells)")
    # Exact ceiling from the union (recompute union per molecule).
    print(f"  min atom pair distance px: p1={np.percentile(md,1):.1f} "
          f"p5={np.percentile(md,5):.1f} p50={np.percentile(md,50):.1f}")
    return stats, got


def sweep_union(name, n, **gen_kw):
    """Per-molecule union collision flag at each stride -> exact ceiling."""
    rng = random.Random(4242)
    bad = {4: 0, 2: 0}
    got = 0
    while got < n:
        s = generate_sample(rng, **gen_kw)
        if s is None:
            continue
        got += 1
        atoms = parse_atoms_string(s.atoms_string)
        bonds = parse_bonds_string(s.bonds_string)
        axy = [(a.x, a.y) for a in atoms]
        bxy = [(b.x, b.y) for b in bonds]
        for stride in (4, 2):
            if collisions(axy, stride) or collisions(bxy, stride):
                bad[stride] += 1
    for stride in (4, 2):
        print(f"  {name} stride-{stride} exact ceiling: "
              f"{1.0 - bad[stride]/got:.4f}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sweep("mixed", n, mode="mixed")
    sweep_union("mixed", n, mode="mixed")
    # Reference-conditions settings (refcond_experiment.py protocol).
    sweep("refcond", n, mode="rdkit", max_atoms=28)
    sweep_union("refcond", n, mode="rdkit", max_atoms=28)


if __name__ == "__main__":
    main()
