"""Profile the host assembly stage (peaks -> SMILES) on a realistic
batch-64 of decoded peaks, to direct the next optimization (VERDICT r3
weak #3 / next #7: host_assemble <= 70 ms/batch-64, e2e >= 600 img/s).

Builds perfect-prediction logits from encoded targets (same fixture the
round-trip tests use: reference semantics src/utils.py:83-228), runs the
device decode once, then times + cProfiles assemble_batch serially.

Usage: python scripts/profile_assembly.py [batch=64] [reps=5]
"""

import cProfile
import io
import os
import pstats
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from abcnet_tpu.data.encode import (encode_targets_np,
                                        parse_atoms_string,
                                        parse_bonds_string)
    from abcnet_tpu.data.generate import generate_sample
    from abcnet_tpu.infer import assemble_batch, extract_peaks
    from abcnet_tpu.utils.diagnostics import fake_logits_from_targets

    rng = random.Random(777)
    t0 = time.perf_counter()
    targets_list = []
    while len(targets_list) < batch:
        s = generate_sample(rng, mode="mixed")
        if s is None:
            continue
        atoms = parse_atoms_string(s.atoms_string)
        bonds = parse_bonds_string(s.bonds_string)
        targets_list.append(encode_targets_np(atoms, bonds))
    print(f"generated {batch} samples in {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    per_sample = [fake_logits_from_targets(t) for t in targets_list]
    preds = {k: np.concatenate([np.asarray(p[k]) for p in per_sample])
             for k in per_sample[0]}
    peaks = extract_peaks(preds)
    host = {k: np.asarray(v) for k, v in peaks.items()}
    print(f"decode+fetch in {time.perf_counter()-t0:.1f}s", flush=True)

    # Warm-up + wall timing.
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        smiles = assemble_batch(host)
        times.append(time.perf_counter() - t0)
    ok = sum(x is not None for x in smiles)
    print(f"assemble_batch({batch}): ok={ok}/{batch} "
          f"ms/batch={1e3*min(times):.1f} (min of {reps}; "
          f"all={['%.1f' % (1e3*t) for t in times]})", flush=True)

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(max(1, reps // 2)):
        assemble_batch(host)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(35)
    print(s.getvalue())
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
    ps.print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
