"""Perfect-target decode ceiling: classify every failure by stage.

Encodes generated molecules' ground-truth labels into dense targets,
lifts them to perfect logits, runs the full decode+assembly pipeline,
and buckets each miss (VERDICT r1 #4: the ceiling was 140/150 rdkit /
143/150 indigo and must reach ~100%):

  struct   — non-isomeric canonicals differ (graph/connectivity error:
             omega quantization, endpoint matching, valence rewrite)
  stereo+  — constitution right, prediction has EXTRA stereo
  stereo-  — constitution right, prediction MISSING stereo
  stereo~  — constitution right, stereo tags conflict
  decode0  — assembly returned None
  parse    — canonicalization of one side raised

Targets come from the PRODUCTION XLA builder (ops/targets.py,
max-combine) — what the model is trained on; pass "oracle" as third
arg to use the reference-faithful sequential-overwrite numpy oracle
instead (its artifact: a later bond's halo erases an earlier center
in crowded regions, utils.py:143-166).

Usage: python scripts/decode_ceiling.py [n_per_mode] [seed0] [oracle]
Prints per-mode tables and each failure with its bucket.
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from abcnet_tpu.chem import canonical_smiles
from abcnet_tpu.data.encode import (encode_targets_np, parse_atoms_string,
                                    parse_bonds_string)
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.infer import assemble_batch, extract_peaks
from abcnet_tpu.utils.diagnostics import (fake_logits_from_targets,
                                          perfect_logits_production)


def classify(truth, pred):
    if pred is None:
        return "decode0"
    try:
        iso_t, iso_p = canonical_smiles(truth), canonical_smiles(pred)
        non_t = canonical_smiles(truth, isomeric=False)
        non_p = canonical_smiles(pred, isomeric=False)
    except Exception as e:
        return f"parse:{type(e).__name__}"
    if iso_t == iso_p:
        return "ok"
    if non_t != non_p:
        return "struct"
    has_t = ("@" in iso_t) or ("/" in iso_t) or ("\\" in iso_t)
    has_p = ("@" in iso_p) or ("/" in iso_p) or ("\\" in iso_p)
    if has_p and not has_t:
        return "stereo+"
    if has_t and not has_p:
        return "stereo-"
    return "stereo~"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    oracle = len(sys.argv) > 3 and sys.argv[3] == "oracle"
    for mode in ("rdkit", "indigo"):
        buckets = {}
        fails = []
        made = 0
        seed = seed0
        while made < n:
            rng = random.Random(seed)
            seed += 1
            sample = generate_sample(rng, mode=mode)
            if sample is None:
                continue
            made += 1
            if oracle:
                atoms = parse_atoms_string(sample.atoms_string)
                bonds = parse_bonds_string(sample.bonds_string)
                preds = fake_logits_from_targets(
                    encode_targets_np(atoms, bonds))
            else:
                preds = perfect_logits_production(sample)
            peaks = extract_peaks(preds)
            pred = assemble_batch(peaks)[0]
            b = classify(sample.smiles, pred)
            buckets[b] = buckets.get(b, 0) + 1
            if b != "ok":
                fails.append((seed - 1, b, sample.smiles, pred))
        print(f"== {mode}: {buckets.get('ok', 0)}/{made} ==")
        for k in sorted(buckets):
            if k != "ok":
                print(f"  {k}: {buckets[k]}")
        for f in fails:
            print(f"  FAIL {f[0]} [{f[1]}]\n    T {f[2]}\n    P {f[3]}",
                  flush=True)


if __name__ == "__main__":
    main()
