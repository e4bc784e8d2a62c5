// Native batch graph assembler: peak arrays -> molecular graph lists.
//
// C++ implementation of the per-image graph-assembly hot loop that the
// reference fans out over a Pool(32) of CPU workers
// (/root/reference/src/multi_proc_img2smiles2.py:268-300, decode logic
// img2smiles2.py:171-311). The TPU framework's device decoder already
// reduces heatmaps to compact peak arrays; this extension performs the
// remaining host work — atom dedup, anisotropic endpoint matching,
// self-loop/duplicate removal, valence fixups, reindexing — for a whole
// batch in one call, without Python-interpreter overhead at serving
// time. Exposed through a plain C ABI consumed via ctypes
// (abcnet_tpu/infer/native.py); MolBlock/SMILES text assembly stays in
// Python where the chemistry stack lives.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct AtomRec {
  double x, y;    // integer peak cell (MolBlock / stereo coordinates)
  double mx, my;  // sub-cell-refined match coordinates (== x,y when the
                  // caller passes no atom_sub)
  int32_t type, charge, hs;
};

inline double leaky_relu(double v) { return v > 0 ? v : 0.5 * v; }

// Reference valence table (img2smiles2.py:32-34), indexed by the
// 14-class atom vocabulary (utils.py:12-13).
const int kMaxValence[14] = {
    4,  // <unknown>
    4,  // C
    3,  // N
    2,  // O
    5,  // P
    1,  // F
    1,  // Cl
    6,  // S
    1,  // Br
    3,  // B
    6,  // Se
    1,  // I
    1,  // H
    4,  // Si
};

// Observed-valence -> element class rewrite (img2smiles2.py:258-271):
// 2->O, 3->N, 4->C, 5->P, 6->S, 7->Cl as vocabulary indices.
inline int32_t rewrite_class(int count) {
  switch (count) {
    case 2: return 3;   // O
    case 3: return 2;   // N
    case 4: return 1;   // C
    case 5: return 4;   // P
    case 6: return 7;   // S
    case 7: return 6;   // Cl
    default: return -1;
  }
}

}  // namespace

extern "C" {

// ABI version of this library. Bump on ANY signature change (the ctypes
// caller verifies it at load time and falls back to the numpy path on
// mismatch — a stale .so built for an older signature would otherwise
// load fine and silently ignore trailing arguments on x86-64).
// History: 1 = original assemble_graph; 2 = + overshoot_cap double;
// 3 = + nullable atom_sub/bond_sub float32 sub-cell offset arrays;
// 5 = + rematch_max double (self-loop bond re-matching);
// 6 = + nullable bond_score float32 [kb] + vprune_score_max double
//     (valence-aware FP-bond prune).
int32_t abcnet_native_abi_version(void) { return 6; }

// Assemble one image's peaks into a molecular graph.
//
// Inputs (row `index` pre-sliced by the caller):
//   atom_xy    int32 [ka, 2], atom_type/charge/hs int32 [ka],
//   atom_valid uint8 [ka]
//   bond_xy    int32 [kb, 2], bond_delta float32 [kb, 2],
//   bond_type  int32 [kb] (0..5), bond_valid uint8 [kb]
//   atom_sub / bond_sub: nullable float32 [ka,2] / [kb,2] sub-cell
//     offsets (infer/decode.py:subcell_offsets). When given, dedup
//     distances, endpoint matching and bond centers use cell+offset;
//     out_atom_pos still returns the INTEGER cells so MolBlock/stereo
//     coordinates keep the encoder's quantization (generate.py:237-246).
// Outputs (caller-allocated, capacities ka / kb):
//   out_atom_pos   float64 [ka, 2]
//   out_atom_type  int32  [ka]   (vocabulary class, valence-fixed)
//   out_atom_charge int32 [ka]   (charge class 0/1/2)
//   out_atom_hs    int32  [ka]
//   out_bonds      int32  [kb, 2] (0-based indices into output atoms)
//   out_bond_type  int32  [kb]   (molblock order 1..6)
// Returns: number of atoms written (>=0); bond count via *out_n_bonds.
// Returns -1 when no graph could be assembled.
int32_t assemble_graph(
    const int32_t* atom_xy, const int32_t* atom_type,
    const int32_t* atom_charge, const int32_t* atom_hs,
    const uint8_t* atom_valid, int32_t ka,
    const int32_t* bond_xy, const float* bond_delta,
    const int32_t* bond_type, const uint8_t* bond_valid, int32_t kb,
    double* out_atom_pos, int32_t* out_atom_type,
    int32_t* out_atom_charge, int32_t* out_atom_hs,
    int32_t* out_bonds, int32_t* out_bond_type, int32_t* out_n_bonds,
    double overshoot_cap, const float* atom_sub, const float* bond_sub,
    double rematch_max, const float* bond_score,
    double vprune_score_max) {
  // Along-axis overshoot penalty beyond the cap (see
  // infer/assemble.py:OVERSHOOT_CAP); cap <= 0 = reference behavior.
  auto overshoot_extra = [overshoot_cap](double along) {
    if (overshoot_cap <= 0) return 0.0;
    double o = -along - overshoot_cap;
    return o > 0 ? 1.5 * o : 0.0;
  };
  *out_n_bonds = 0;

  // ---- atoms: scan-order dedup at squared distance < 4
  // (img2smiles2.py:177-191). Peaks arrive score-ordered; sort by
  // (x, y) to reproduce the reference's row-major nonzero() order.
  std::vector<int> order;
  order.reserve(ka);
  for (int i = 0; i < ka; ++i)
    if (atom_valid[i]) order.push_back(i);
  if (order.empty()) return -1;
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    if (atom_xy[2 * a] != atom_xy[2 * b])
      return atom_xy[2 * a] < atom_xy[2 * b];
    return atom_xy[2 * a + 1] < atom_xy[2 * b + 1];
  });

  std::vector<AtomRec> atoms;
  atoms.reserve(order.size());
  for (int idx : order) {
    double x = atom_xy[2 * idx], y = atom_xy[2 * idx + 1];
    double mx = x, my = y;
    if (atom_sub) {
      mx += atom_sub[2 * idx];
      my += atom_sub[2 * idx + 1];
    }
    bool dup = false;
    for (const AtomRec& a : atoms) {
      double dx = a.mx - mx, dy = a.my - my;
      if (dx * dx + dy * dy < 4.0) { dup = true; break; }
    }
    if (dup) continue;
    atoms.push_back({x, y, mx, my,
                     atom_type[idx], atom_charge[idx], atom_hs[idx]});
  }
  const int na = static_cast<int>(atoms.size());

  // ---- endpoint matching (img2smiles2.py:193-210) ----
  std::vector<std::pair<int, int>> pairs;
  std::vector<int32_t> orders;
  std::vector<float> scores;
  for (int b = 0; b < kb; ++b) {
    if (!bond_valid[b]) continue;
    double px = bond_xy[2 * b], py = bond_xy[2 * b + 1];
    if (bond_sub) {
      px += bond_sub[2 * b];
      py += bond_sub[2 * b + 1];
    }
    double dx = bond_delta[2 * b], dy = bond_delta[2 * b + 1];
    double norm = std::sqrt(dx * dx + dy * dy);
    if (norm < 1e-9) norm = 1e-9;
    double e1x = dx / norm, e1y = dy / norm;
    double e2x = -e1y, e2y = e1x;

    double p1x = px + dx, p1y = py + dy;   // end side
    double p2x = px - dx, p2y = py - dy;   // begin side
    int best1 = -1, best2 = -1;
    double bd1 = 1e30, bd2 = 1e30;
    // Runner-up candidates on each side (for self-loop re-matching):
    // best end/begin atom EXCLUDING the current winner of that side.
    int run1 = -1, run2 = -1;
    double rd1 = 1e30, rd2 = 1e30;
    for (int a = 0; a < na; ++a) {
      double r1x = p1x - atoms[a].mx, r1y = p1y - atoms[a].my;
      double al1 = r1x * e1x + r1y * e1y;
      double d1 = std::fabs(leaky_relu(al1)) + overshoot_extra(al1) +
                  std::fabs(2.0 * (r1x * e2x + r1y * e2y));
      if (d1 < bd1) {
        rd1 = bd1; run2 = best2;
        bd1 = d1; best2 = a;
      } else if (d1 < rd1) { rd1 = d1; run2 = a; }
      double r2x = p2x - atoms[a].mx, r2y = p2y - atoms[a].my;
      double al2 = -(r2x * e1x + r2y * e1y);
      double d2 = std::fabs(leaky_relu(al2)) + overshoot_extra(al2) +
                  std::fabs(2.0 * (r2x * e2x + r2y * e2y));
      if (d2 < bd2) {
        rd2 = bd2; run1 = best1;
        bd2 = d2; best1 = a;
      } else if (d2 < rd2) { rd2 = d2; run1 = a; }
    }
    if (best1 < 0 || best2 < 0) continue;
    if (best1 == best2) {
      // Self-loop: both endpoints argmin to the same atom. The
      // reference drops the bond (img2smiles2.py:217-219) — and with
      // it any degree-1 atom whose only bond this was (the atoms-1
      // failure bucket, logs/failure_taxonomy_r4.log). Re-match to the
      // best DISTINCT pair instead: keep one winner, move the other
      // endpoint to its runner-up, choosing the cheaper total; accept
      // only while the moved endpoint still scores <= rematch_max grid
      // units. rematch_max <= 0 restores exact reference behavior.
      // Only activates on would-be-dropped bonds; all other matches
      // are bit-identical to the reference rule.
      if (rematch_max <= 0) continue;
      bool okA = run2 >= 0 && rd1 <= rematch_max;  // begin=best1, end=run2
      bool okB = run1 >= 0 && rd2 <= rematch_max;  // begin=run1, end=best2
      double costA = okA ? bd2 + rd1 : 1e30;
      double costB = okB ? rd2 + bd1 : 1e30;
      if (!okA && !okB) continue;
      if (costA <= costB) best2 = run2; else best1 = run1;
    }
    bool dup = false;
    for (const auto& pr : pairs)
      if ((pr.first == best1 && pr.second == best2) ||
          (pr.first == best2 && pr.second == best1)) { dup = true; break; }
    if (dup) continue;
    pairs.emplace_back(best1, best2);
    // class 0..5 -> molblock order 1..6 (vocab BOND_DEVOCAB).
    orders.push_back(bond_type[b] + 1);
    scores.push_back(bond_score ? bond_score[b] : 1.0f);
  }
  if (pairs.empty()) return -1;

  // ---- valence fixups (img2smiles2.py:247-271) ----
  std::vector<int> counts(na, 0);
  for (int a = 0; a < na; ++a) {
    // charge class 0/1/2 -> 0/+1/-1; counts start at -charge.
    int charge = atoms[a].charge == 1 ? 1 : (atoms[a].charge == 2 ? -1 : 0);
    counts[a] = -charge;
  }
  for (size_t i = 0; i < pairs.size(); ++i) {
    int n = orders[i] >= 4 ? 1 : orders[i];
    counts[pairs[i].first] += n;
    counts[pairs[i].second] += n;
  }

  // ---- valence-aware FP-bond prune (infer/assemble.py:
  // VPRUNE_SCORE_MAX — endpoint theft measured zero; the over-valence
  // states that trigger the reference element rewrite come from
  // false-positive detected bonds). Before rewriting, drop the
  // lowest-score incident bond when it is under the gate, the drop
  // resolves the violation, and both endpoints keep degree >= 1.
  // <= 0 (or no scores) = exact reference behavior. ----
  std::vector<char> droppedv(pairs.size(), 0);
  if (vprune_score_max > 0 && bond_score) {
    std::vector<int> deg(na, 0);
    for (const auto& pr : pairs) {
      deg[pr.first] += 1;
      deg[pr.second] += 1;
    }
    for (int a = 0; a < na; ++a) {
      for (;;) {
        int cls = atoms[a].type;
        int maxv = (cls >= 0 && cls < 14) ? kMaxValence[cls] : 4;
        if (counts[a] <= maxv) break;
        int best = -1;
        float bestScore = 0.0f;
        for (size_t i = 0; i < pairs.size(); ++i) {
          if (droppedv[i]) continue;
          int x = pairs[i].first, y = pairs[i].second;
          if (x != a && y != a) continue;
          if (scores[i] >= vprune_score_max) continue;
          if (deg[x] <= 1 || deg[y] <= 1) continue;
          if (best < 0 || scores[i] < bestScore) {
            best = static_cast<int>(i);
            bestScore = scores[i];
          }
        }
        if (best < 0) break;
        droppedv[best] = 1;
        int x = pairs[best].first, y = pairs[best].second;
        int n = orders[best] >= 4 ? 1 : orders[best];
        counts[x] -= n;
        counts[y] -= n;
        deg[x] -= 1;
        deg[y] -= 1;
      }
    }
    size_t w = 0;
    for (size_t i = 0; i < pairs.size(); ++i) {
      if (droppedv[i]) continue;
      pairs[w] = pairs[i];
      orders[w] = orders[i];
      scores[w] = scores[i];
      ++w;
    }
    pairs.resize(w);
    orders.resize(w);
    scores.resize(w);
    if (pairs.empty()) return -1;
  }

  for (int a = 0; a < na; ++a) {
    int cls = atoms[a].type;
    int maxv = (cls >= 0 && cls < 14) ? kMaxValence[cls] : 4;
    if (counts[a] > maxv) {
      int32_t nc = rewrite_class(counts[a]);
      if (nc >= 0) atoms[a].type = nc;
    }
  }

  // ---- drop unbonded atoms + reindex (img2smiles2.py:236-245,273-297) --
  std::vector<int> newIndex(na, -1);
  int k = 0;
  for (size_t i = 0; i < pairs.size(); ++i) {
    for (int endp : {pairs[i].first, pairs[i].second}) {
      if (newIndex[endp] < 0) newIndex[endp] = 1;  // mark used
    }
  }
  for (int a = 0; a < na; ++a) {
    if (newIndex[a] > 0) {
      newIndex[a] = k;
      out_atom_pos[2 * k] = atoms[a].x;
      out_atom_pos[2 * k + 1] = atoms[a].y;
      out_atom_type[k] = atoms[a].type;
      out_atom_charge[k] = atoms[a].charge;
      out_atom_hs[k] = atoms[a].hs;
      ++k;
    }
  }
  int nb = 0;
  for (size_t i = 0; i < pairs.size(); ++i) {
    out_bonds[2 * nb] = newIndex[pairs[i].first];
    out_bonds[2 * nb + 1] = newIndex[pairs[i].second];
    out_bond_type[nb] = orders[i];
    ++nb;
  }
  *out_n_bonds = nb;
  return k;
}

}  // extern "C"
