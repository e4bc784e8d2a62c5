"""Instrument the decode->assemble stages for the atom-drop bucket
(VERDICT r4 #4: 28/512 molecules lose 1-4 atoms while the heatmap's
tolerance-3 P/R is ~0.9996/0.9999 — so the loss is downstream of
detection, in the d^2<4 dedup or the endpoint matcher of
infer/assemble.py, reference semantics img2smiles2.py:181-186,193-210).

For every molecule this probe tracks ground-truth atom coverage through
the three host stages and attributes each lost atom to its mechanism:

  detector   no raw peak within 2 grid units of the GT atom
  dedup      the GT atom's peak was merged into a DIFFERENT GT atom's
             peak by the scan-order d^2<4 rule
  unbonded   the peak survived dedup but matched no bond endpoint, so
             the reference-parity unbonded-atom drop removed it

and, for the dual failure mode, counts atoms whose matched-bond count
exceeds their GT degree (endpoint theft -> valence rewrite -> the
C>P / N>S "elem-swap" bucket of logs/failure_taxonomy_r4.log).

CPU-only (reads the f16 git snapshot, never touches the TPU or the
orbax dir the live trainer is writing).

Usage: python scripts/atom_drop_probe.py [n_per_mode] [snapshot_npz]
"""

import os
import random
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from abcnet_tpu.data import pipeline  # noqa: E402
from abcnet_tpu.data.encode import parse_atoms_string  # noqa: E402
from abcnet_tpu.data.generate import generate_sample  # noqa: E402
from abcnet_tpu.data import vocab  # noqa: E402
from abcnet_tpu.infer import assemble  # noqa: E402
from abcnet_tpu.infer.decode import make_infer_pipeline  # noqa: E402
from abcnet_tpu.eval.scoring import score_pairs  # noqa: E402
from abcnet_tpu.train import trainer  # noqa: E402
from scripts.snapshot_weights import _unflatten  # noqa: E402

BATCH = 8


def load_snapshot_state(npz_path: str):
    z = np.load(npz_path)
    step = int(z["__step__"])
    tree = _unflatten({k: z[k] for k in z.files if k != "__step__"})
    state = trainer.create_state(trainer.TrainConfig())
    like = lambda snap, ref: jax.tree_util.tree_map(  # noqa: E731
        lambda s, r: np.asarray(s, r.dtype).reshape(r.shape), snap,
        jax.device_get(ref))
    return state.replace(params=like(tree["params"], state.params),
                         batch_stats=like(tree["batch_stats"],
                                          state.batch_stats)), step


def stage_coverage(peaks, index, gt_xy, gt_degree):
    """Track GT-atom coverage through dedup and the unbonded drop.

    Returns (lost_detector, lost_dedup, lost_unbonded, stolen) where
    stolen = atoms with matched bond count > GT degree + 1."""
    av = peaks["atom_valid"][index]
    axy = peaks["atom_xy"][index][av].astype(np.float64)
    amxy = axy.copy()
    if "atom_sub" in peaks:
        amxy = amxy + np.asarray(peaks["atom_sub"][index][av], np.float64)

    # GT -> nearest raw peak (one-to-one, greedy by distance).
    lost_detector, gt_of_peak = [], {}
    if len(amxy):
        d = ((gt_xy[:, None, :] - amxy[None, :, :]) ** 2).sum(-1)
        pairs = sorted((d[g, p], g, p) for g in range(len(gt_xy))
                       for p in range(len(amxy)))
        taken_g, taken_p = set(), set()
        for dist, g, p in pairs:
            if dist > 4.0 or g in taken_g or p in taken_p:
                continue
            taken_g.add(g)
            taken_p.add(p)
            gt_of_peak[p] = g
        lost_detector = [g for g in range(len(gt_xy)) if g not in taken_g]
    else:
        lost_detector = list(range(len(gt_xy)))

    # Replicate the scan-order d^2<4 dedup (assemble_smiles).
    order = np.lexsort((peaks["atom_xy"][index][av][:, 1],
                        peaks["atom_xy"][index][av][:, 0]))
    kept, kept_pos = [], []
    merged_into = {}
    for i in order:
        m = amxy[i]
        if kept_pos:
            d2 = ((np.asarray(kept_pos) - m) ** 2).sum(-1)
            j = int(d2.argmin())
        if kept_pos and d2[j] < 4:
            merged_into[i] = kept[j]
            continue
        kept.append(i)
        kept_pos.append(m)
    lost_dedup = []
    for i, j in merged_into.items():
        gi, gj = gt_of_peak.get(i), gt_of_peak.get(j)
        if gi is not None and gi != gj:
            lost_dedup.append((gi, float(((amxy[i] - amxy[j]) ** 2).sum())))

    # Replicate endpoint matching on the kept atoms.
    bv = peaks["bond_valid"][index]
    bxy = peaks["bond_xy"][index][bv].astype(np.float64)
    if "bond_sub" in peaks:
        bxy = bxy + np.asarray(peaks["bond_sub"][index][bv], np.float64)
    bdelta = peaks["bond_delta"][index][bv].astype(np.float64)
    used = set()
    deg = {k: 0 for k in range(len(kept))}
    if len(bxy) and len(kept_pos):
        ap = np.asarray(kept_pos)[None, :, :]
        p1 = (bxy + bdelta)[:, None, :]
        p2 = (bxy - bdelta)[:, None, :]
        norm = np.maximum(np.sqrt((bdelta ** 2).sum(-1, keepdims=True)),
                          1e-9)
        e1 = bdelta / norm
        e2 = np.stack([-e1[:, 1], e1[:, 0]], axis=-1)
        e1, e2 = e1[:, None, :], e2[:, None, :]
        al1 = ((p1 - ap) * e1).sum(-1)
        al2 = -((p2 - ap) * e1).sum(-1)
        d1 = (np.abs(assemble._leaky_relu(al1))
              + assemble._overshoot_extra(al1, assemble.OVERSHOOT_CAP)
              + np.abs(2 * ((p1 - ap) * e2).sum(-1)))
        d2_ = (np.abs(assemble._leaky_relu(al2))
               + assemble._overshoot_extra(al2, assemble.OVERSHOOT_CAP)
               + np.abs(2 * ((p2 - ap) * e2).sum(-1)))
        i1s, i2s = d2_.argmin(-1), d1.argmin(-1)
        pair_seen = set()
        for i in range(len(bxy)):
            a, b = int(i1s[i]), int(i2s[i])
            if a == b or (a, b) in pair_seen or (b, a) in pair_seen:
                continue
            pair_seen.add((a, b))
            used.add(a)
            used.add(b)
            deg[a] += 1
            deg[b] += 1
    lost_unbonded = []
    for k_idx, i in enumerate(kept):
        g = gt_of_peak.get(i)
        if g is not None and k_idx not in used and g not in lost_detector:
            lost_unbonded.append(g)
    stolen = sum(1 for k_idx, i in enumerate(kept)
                 if gt_of_peak.get(i) is not None
                 and deg[k_idx] > gt_degree[gt_of_peak[i]])
    return lost_detector, lost_dedup, lost_unbonded, stolen


def classify_bonds(peaks, index, gt_xy, gt_bonds):
    """Attribute each predicted bond to its GT bond (greedy one-to-one
    by center distance) and split the overdeg mechanism:

      fp        predicted bond with no GT bond within 2 grid units of
                its center — extra detected bond, inflates degree
      theft     matched GT bond, but an endpoint argmin'ed to a
                DIFFERENT atom than the GT endpoint — steals degree
                from the right atom and gives it to the wrong one
      theft_repairable  the GT endpoint's own peak survived dedup, so
                a smarter assignment could have used it

    Returns (fp, theft, theft_repairable, missed_gt_bonds)."""
    av = peaks["atom_valid"][index]
    amxy = peaks["atom_xy"][index][av].astype(np.float64)
    if "atom_sub" in peaks:
        amxy = amxy + np.asarray(peaks["atom_sub"][index][av], np.float64)
    # Scan-order d^2<4 dedup, as the assembler applies before matching.
    order = np.lexsort((peaks["atom_xy"][index][av][:, 1],
                        peaks["atom_xy"][index][av][:, 0]))
    kept_pos = []
    for i in order:
        m = amxy[i]
        if kept_pos:
            d2k = ((np.asarray(kept_pos) - m) ** 2).sum(-1)
            if d2k.min() < 4:
                continue
        kept_pos.append(m)
    amxy = np.asarray(kept_pos, np.float64).reshape(-1, 2)
    bv = peaks["bond_valid"][index]
    bxy = peaks["bond_xy"][index][bv].astype(np.float64)
    if "bond_sub" in peaks:
        bxy = bxy + np.asarray(peaks["bond_sub"][index][bv], np.float64)
    bdelta = peaks["bond_delta"][index][bv].astype(np.float64)
    if not len(bxy):
        return 0, 0, 0, len(gt_bonds), []

    # Predicted-bond -> GT-bond greedy matching by center distance.
    gt_c = np.asarray([[cx, cy] for _, _, cx, cy in gt_bonds],
                      np.float64) if gt_bonds else np.zeros((0, 2))
    gt_of_bond = {}
    if len(gt_c):
        d = ((bxy[:, None, :] - gt_c[None, :, :]) ** 2).sum(-1)
        pairs = sorted((d[p, g], p, g) for p in range(len(bxy))
                       for g in range(len(gt_c)))
        tp, tg = set(), set()
        for dist, p, g in pairs:
            if dist > 4.0 or p in tp or g in tg:
                continue
            tp.add(p)
            tg.add(g)
            gt_of_bond[p] = g
    fp = sum(1 for p in range(len(bxy)) if p not in gt_of_bond)
    missed = len(gt_bonds) - len(gt_of_bond)

    # Endpoint matching exactly as the assembler does it.
    norm = np.maximum(np.sqrt((bdelta ** 2).sum(-1, keepdims=True)), 1e-9)
    e1 = bdelta / norm
    e2 = np.stack([-e1[:, 1], e1[:, 0]], axis=-1)
    ap = amxy[None, :, :]
    p1 = (bxy + bdelta)[:, None, :]
    p2 = (bxy - bdelta)[:, None, :]
    e1b, e2b = e1[:, None, :], e2[:, None, :]
    al1 = ((p1 - ap) * e1b).sum(-1)
    al2 = -((p2 - ap) * e1b).sum(-1)
    d1 = (np.abs(assemble._leaky_relu(al1))
          + assemble._overshoot_extra(al1, assemble.OVERSHOOT_CAP)
          + np.abs(2 * ((p1 - ap) * e2b).sum(-1)))
    d2_ = (np.abs(assemble._leaky_relu(al2))
           + assemble._overshoot_extra(al2, assemble.OVERSHOOT_CAP)
           + np.abs(2 * ((p2 - ap) * e2b).sum(-1)))
    ends = d1.argmin(-1)      # end-side atom per bond
    begins = d2_.argmin(-1)   # begin-side atom per bond

    # Peak -> GT atom (same greedy protocol as stage_coverage).
    gt_of_peak = {}
    if len(amxy):
        d = ((gt_xy[:, None, :] - amxy[None, :, :]) ** 2).sum(-1)
        pairs = sorted((d[g, p], g, p) for g in range(len(gt_xy))
                       for p in range(len(amxy)))
        tg2, tp2 = set(), set()
        for dist, g, p in pairs:
            if dist > 4.0 or g in tg2 or p in tp2:
                continue
            tg2.add(g)
            tp2.add(p)
            gt_of_peak[p] = g
    peak_of_gt = {g: p for p, g in gt_of_peak.items()}

    # Per-bond separability features for a would-be FP prune: the
    # heatmap score, the worse of the two endpoint match distances, and
    # length consistency |dist(matched atoms) - 2|delta||.
    feats = []
    bscore = peaks.get("bond_score")
    for p in range(len(bxy)):
        a, b = int(begins[p]), int(ends[p])
        worse = float(max(d2_[p, a], d1[p, b]))
        blen = 2.0 * float(np.sqrt((bdelta[p] ** 2).sum()))
        alen = float(np.sqrt(((amxy[a] - amxy[b]) ** 2).sum())) \
            if a != b else 0.0
        sc = float(bscore[index][bv][p]) if bscore is not None else -1.0
        feats.append((p in gt_of_bond, sc, worse, abs(alen - blen)))

    theft = theft_rep = 0
    for p, g in gt_of_bond.items():
        g1, g2, _, _ = gt_bonds[g]
        # Assembler convention: begin side is p2 = bxy - bdelta
        # (atom_index1 = d2.argmin), end side is p1 = bxy + bdelta;
        # orient the GT pair by which GT endpoint is closer to p2.
        pa = np.asarray([gt_xy[g1], gt_xy[g2]])
        d_beg = ((pa - (bxy[p] - bdelta[p])) ** 2).sum(-1)
        gb, ge = (g1, g2) if d_beg[0] <= d_beg[1] else (g2, g1)
        for side_atom, side_gt in ((int(begins[p]), gb), (int(ends[p]), ge)):
            got = gt_of_peak.get(side_atom)
            if got is not None and got != side_gt:
                theft += 1
                if side_gt in peak_of_gt:
                    theft_rep += 1
    return fp, theft, theft_rep, missed, feats


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    snap = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "snapshots", "r5_latest.npz")
    state, step = load_snapshot_state(snap)
    print(f"snapshot step {step}", flush=True)
    run = make_infer_pipeline(state)

    for mode, seed in (("rdkit", 777001), ("indigo", 777002)):
        rng = random.Random(seed)
        samples = []
        while len(samples) < n:
            s = generate_sample(rng, mode=mode)
            if s is not None:
                samples.append(s)
        agg = {"detector": 0, "dedup": 0, "unbonded": 0, "stolen": 0,
               "mols_affected": 0, "exact": 0,
               "bond_fp": 0, "theft": 0, "theft_rep": 0, "bond_miss": 0}
        dedup_d2 = []
        all_feats = []
        truths, preds = [], []
        preds_norematch = []
        preds_vprune = []
        for lo in range(0, n, BATCH):
            chunk = samples[lo:lo + BATCH]
            peaks = run(np.stack([s.image for s in chunk]))
            peaks = {k: np.asarray(v) for k, v in peaks.items()}
            smis = assemble.assemble_batch(peaks)
            preds_norematch.extend(
                assemble.assemble_batch(peaks, rematch_max=0.0))
            preds_vprune.extend(
                assemble.assemble_batch(peaks, vprune_score_max=0.8))
            for bi, s in enumerate(chunk):
                truths.append(s.smiles)
                preds.append(smis[bi])
                atoms = parse_atoms_string(s.atoms_string)
                gt_xy = np.asarray([[a.x / vocab.STRIDE, a.y / vocab.STRIDE]
                                    for a in atoms], np.float64)
                from abcnet_tpu.data.encode import parse_bonds_string
                bonds = parse_bonds_string(s.bonds_string)
                gt_deg = [0] * len(atoms)
                gt_bonds = []
                for b in bonds:
                    # endpoints: nearest GT atoms to (x,y)+-(dx,dy)
                    gends = []
                    for ex, ey in ((b.x + b.dx, b.y + b.dy),
                                   (b.x - b.dx, b.y - b.dy)):
                        d = ((gt_xy - [ex / vocab.STRIDE,
                                       ey / vocab.STRIDE]) ** 2).sum(-1)
                        gends.append(int(d.argmin()))
                        gt_deg[gends[-1]] += 1
                    gt_bonds.append((gends[0], gends[1],
                                     b.x / vocab.STRIDE,
                                     b.y / vocab.STRIDE))
                det, ded, unb, stol = stage_coverage(peaks, bi, gt_xy,
                                                     gt_deg)
                bfp, bth, bthr, bmiss, feats = classify_bonds(
                    peaks, bi, gt_xy, gt_bonds)
                agg["bond_fp"] += bfp
                agg["theft"] += bth
                agg["theft_rep"] += bthr
                agg["bond_miss"] += bmiss
                all_feats.extend(feats)
                if smis[bi] == s.smiles:
                    agg["exact"] += 1
                if det or ded or unb or stol:
                    agg["mols_affected"] += 1
                agg["detector"] += len(det)
                agg["dedup"] += len(ded)
                agg["unbonded"] += len(unb)
                agg["stolen"] += stol
                dedup_d2.extend(d2 for _, d2 in ded)
        print(f"[{mode}] n={n} exact={agg['exact']} "
              f"mols_affected={agg['mols_affected']} "
              f"lost: detector={agg['detector']} dedup={agg['dedup']} "
              f"unbonded={agg['unbonded']} overdeg={agg['stolen']}",
              flush=True)
        print(f"  bonds: fp={agg['bond_fp']} theft={agg['theft']} "
              f"(repairable={agg['theft_rep']}) missed={agg['bond_miss']}",
              flush=True)
        for name, idx in (("score", 1), ("worse_end", 2), ("len_err", 3)):
            tp = sorted(f[idx] for f in all_feats if f[0])
            fpd = sorted(f[idx] for f in all_feats if not f[0])
            q = lambda v, p: v[int(p * (len(v) - 1))] if v else float("nan")  # noqa: E731
            print(f"  {name}: TP p5/p50/p95="
                  f"{q(tp, .05):.3f}/{q(tp, .5):.3f}/{q(tp, .95):.3f}  "
                  f"FP p5/p50/p95="
                  f"{q(fpd, .05):.3f}/{q(fpd, .5):.3f}/{q(fpd, .95):.3f} "
                  f"(nTP={len(tp)} nFP={len(fpd)})", flush=True)
        if dedup_d2:
            print(f"  dedup-merge d^2 of distinct-GT merges: "
                  f"{sorted(round(d, 2) for d in dedup_d2)}", flush=True)
        print(f"  score[rematch]   {score_pairs(truths, preds)}",
              flush=True)
        print(f"  score[reference] {score_pairs(truths, preds_norematch)}",
              flush=True)
        print(f"  score[vprune0.8] {score_pairs(truths, preds_vprune)}",
              flush=True)


if __name__ == "__main__":
    main()
