// Native canonical-SMILES engine for the serving decode tail.
//
// C++ port of the Python chemistry path that follows graph assembly at
// serving time (abcnet_tpu/infer/assemble.py:_graph_to_smiles):
//   decoded graph -> MolBlock-semantics molecule build -> kekulize +
//   implicit H -> explicit-H removal -> wedge/EZ stereo perception ->
//   non-stereogenic pruning -> canonical isomeric SMILES.
//
// The reference delegates this stage to RDKit (MolFromMolBlock +
// MolToSmiles, /root/reference/src/generate_smiles.py:115-119); the
// framework's from-scratch Python implementation (chem/mol.py,
// chem/molblock.py, chem/stereo.py, chem/ez.py, chem/smiles.py) is the
// semantic oracle. This file replicates it function-for-function —
// tests/test_native.py asserts EXACT string agreement over generated
// corpora — because host assembly is the serving bottleneck
// (profile: to_smiles = 68% of assemble_batch; VERDICT r3 next #7).
//
// Build: native/Makefile (g++ -O3 -shared -fPIC, linked into
// libabcnet_native.so together with assemble.cpp).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <set>
#include <string>
#include <utility>
#include <vector>

namespace chem {

// ---------------------------------------------------------------------------
// Periodic data (chem/periodic.py) — decode-path subset: the 14-class
// vocabulary (data/vocab.py) is the only source of atoms here.
// ---------------------------------------------------------------------------

enum Sym {
  S_C = 0, S_N, S_O, S_P, S_F, S_Cl, S_S, S_Br, S_B, S_Se, S_I, S_H,
  S_Si, NUM_SYMS
};

struct ElementInfo {
  const char* name;
  int atomic_number;
  int valences[3];  // ascending; -1 terminated
  bool organic_subset;
  bool aromatic_ok;
};

const ElementInfo kElements[NUM_SYMS] = {
    {"C", 6, {4, -1, -1}, true, true},
    {"N", 7, {3, -1, -1}, true, true},
    {"O", 8, {2, -1, -1}, true, true},
    {"P", 15, {3, 5, -1}, true, true},
    {"F", 9, {1, -1, -1}, true, false},
    {"Cl", 17, {1, -1, -1}, true, false},
    {"S", 16, {2, 4, 6}, true, true},
    {"Br", 35, {1, -1, -1}, true, false},
    {"B", 5, {3, -1, -1}, true, true},
    {"Se", 34, {2, 4, 6}, false, true},
    {"I", 53, {1, -1, -1}, true, false},
    {"H", 1, {1, -1, -1}, false, false},
    {"Si", 14, {4, -1, -1}, false, true},
};

// 14-class vocabulary index -> Sym (vocab.ATOM_DEVOCAB; class 0 -> C,
// img2smiles2.py:25).
const Sym kVocabToSym[14] = {S_C, S_C, S_N, S_O, S_P, S_F, S_Cl, S_S,
                             S_Br, S_B, S_Se, S_I, S_H, S_Si};

// default_valences(symbol, charge) — chem/periodic.py:62-96.
inline void default_valences(Sym sym, int charge, int out[4]) {
  out[0] = out[1] = out[2] = out[3] = -1;
  const ElementInfo& e = kElements[sym];
  if (charge == 0) {
    for (int i = 0; i < 3; ++i) out[i] = e.valences[i];
    return;
  }
  switch (sym) {
    case S_C:
      if (charge == 1 || charge == -1) { out[0] = 3; return; }
      break;
    case S_N: case S_P:
      for (int i = 0; i < 3 && e.valences[i] >= 0; ++i)
        out[i] = charge > 0 ? e.valences[i] + charge
                            : std::max(e.valences[i] + charge, 0);
      return;
    case S_O: case S_S: case S_Se:
      for (int i = 0; i < 3 && e.valences[i] >= 0; ++i)
        out[i] = charge > 0 ? e.valences[i] + charge
                            : std::max(e.valences[i] + charge, 0);
      return;
    case S_B:
      if (charge < 0) { out[0] = 4; return; }
      break;
    case S_F: case S_Cl: case S_Br: case S_I:
      out[0] = charge < 0 ? 0 : 2;
      return;
    default:
      break;
  }
  for (int i = 0; i < 3; ++i) out[i] = e.valences[i];
}

// implicit_hydrogens — chem/periodic.py:99-104.
inline int implicit_hydrogens(Sym sym, int charge, int bos) {
  int v[4];
  default_valences(sym, charge, v);
  for (int i = 0; i < 4 && v[i] >= 0; ++i)
    if (bos <= v[i]) return v[i] - bos;
  return 0;
}

// ---------------------------------------------------------------------------
// Molecular graph (chem/mol.py)
// ---------------------------------------------------------------------------

const int STEREO_NONE = 0, STEREO_WEDGE = 1, STEREO_HASH = 6;
const int EZ_NONE = 0, EZ_CIS = 1, EZ_TRANS = 2;
const int VIRTUAL = -1;

struct Atom {
  Sym sym = S_C;
  int charge = 0;
  int expl_hs = -1;  // -1 = implicit (None); >=0 pins the count
  bool aromatic = false;
  int impl_hs = 0;
  double x = 0, y = 0;
  int parity = 0;  // 0 none, 1 '@', 2 '@@' (reference neighbor order)

  int total_hs() const { return expl_hs >= 0 ? expl_hs : impl_hs; }
  int atomic_number() const { return kElements[sym].atomic_number; }
};

struct Bond {
  int a = 0, b = 0;
  int order = 1;
  bool aromatic = false;
  int stereo = STEREO_NONE;  // narrow end at atom `a`
  int ez = EZ_NONE;

  int other(int i) const { return i == a ? b : a; }
};

struct MolException {
  const char* what;
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int>> adj;  // atom -> bond indices

  int num_atoms() const { return (int)atoms.size(); }
  int num_bonds() const { return (int)bonds.size(); }

  int add_atom(const Atom& a) {
    atoms.push_back(a);
    adj.emplace_back();
    return (int)atoms.size() - 1;
  }

  int add_bond(int a, int b, int order, bool aromatic, int stereo) {
    if (a == b) throw MolException{"self-bond"};
    for (int bi : adj[a])
      if (bonds[bi].other(a) == b) throw MolException{"duplicate bond"};
    Bond bd;
    bd.a = a; bd.b = b; bd.order = order; bd.aromatic = aromatic;
    bd.stereo = stereo;
    bonds.push_back(bd);
    int idx = (int)bonds.size() - 1;
    adj[a].push_back(idx);
    adj[b].push_back(idx);
    return idx;
  }

  int degree(int i) const { return (int)adj[i].size(); }

  int bond_order_sum(int i) const {
    int t = 0;
    for (int bi : adj[i]) t += bonds[bi].order;
    return t;
  }

  std::vector<int> neighbors(int i) const {
    std::vector<int> out;
    out.reserve(adj[i].size());
    for (int bi : adj[i]) out.push_back(bonds[bi].other(i));
    return out;
  }

  // ring_bond_flags via Tarjan bridges — chem/mol.py:165-210.
  std::vector<bool> ring_bond_flags() const {
    int n = num_atoms();
    std::vector<int> disc(n, -1), low(n, 0);
    std::vector<bool> is_bridge(num_bonds(), false);
    int timer = 0;
    struct Frame { int v, parent_bond, ptr; };
    for (int root = 0; root < n; ++root) {
      if (disc[root] != -1) continue;
      std::vector<Frame> stack{{root, -1, 0}};
      while (!stack.empty()) {
        Frame f = stack.back();
        stack.pop_back();
        if (f.ptr == 0) { disc[f.v] = low[f.v] = timer++; }
        bool advanced = false;
        int ptr = f.ptr;
        const std::vector<int>& a = adj[f.v];
        while (ptr < (int)a.size()) {
          int bi = a[ptr];
          ++ptr;
          if (bi == f.parent_bond) continue;
          int u = bonds[bi].other(f.v);
          if (disc[u] == -1) {
            stack.push_back({f.v, f.parent_bond, ptr});
            stack.push_back({u, bi, 0});
            advanced = true;
            break;
          }
          low[f.v] = std::min(low[f.v], disc[u]);
        }
        if (!advanced && ptr >= (int)a.size()) {
          if (f.parent_bond != -1) {
            int p = bonds[f.parent_bond].other(f.v);
            low[p] = std::min(low[p], low[f.v]);
            if (low[f.v] > disc[p]) is_bridge[f.parent_bond] = true;
          }
        }
      }
    }
    std::vector<bool> out(num_bonds());
    for (int i = 0; i < num_bonds(); ++i) out[i] = !is_bridge[i];
    return out;
  }

  std::vector<bool> ring_atom_flags() const {
    std::vector<bool> flags(num_atoms(), false);
    std::vector<bool> rb = ring_bond_flags();
    for (int i = 0; i < num_bonds(); ++i)
      if (rb[i]) { flags[bonds[i].a] = true; flags[bonds[i].b] = true; }
    return flags;
  }

  void assign_implicit_hydrogens() {
    for (int i = 0; i < num_atoms(); ++i) {
      Atom& a = atoms[i];
      if (a.expl_hs >= 0) { a.impl_hs = a.expl_hs; continue; }
      a.impl_hs = implicit_hydrogens(a.sym, a.charge, bond_order_sum(i));
    }
  }
};

// ---------------------------------------------------------------------------
// Kekulization (chem/aromaticity.py:kekulize) — deterministic
// backtracking in the same candidate order as the Python oracle.
// ---------------------------------------------------------------------------

inline int h_count_for_kekulize(const Mol& mol, int idx) {
  const Atom& a = mol.atoms[idx];
  if (a.expl_hs >= 0) return a.expl_hs;
  if (a.sym == S_C && a.charge == 0)
    return std::max(0, 3 - mol.degree(idx));
  return 0;
}

inline bool needs_pi_bond(const Mol& mol, int idx) {
  const Atom& a = mol.atoms[idx];
  for (int bi : mol.adj[idx]) {
    const Bond& b = mol.bonds[bi];
    if (!b.aromatic && b.order >= 2) return false;
  }
  switch (a.sym) {
    case S_O: case S_S: case S_Se:
      return a.charge == 1;
    case S_N: case S_P: {
      int target = 3 + a.charge;
      int conn = mol.degree(idx) + h_count_for_kekulize(mol, idx);
      return conn < target;
    }
    case S_C: {
      if (a.charge != 0) return false;
      int conn = mol.degree(idx) + h_count_for_kekulize(mol, idx);
      return conn < 4;
    }
    default:
      return false;
  }
}

struct KekulizeState {
  const std::vector<int>& need_atoms;
  const std::map<int, std::vector<std::pair<int, int>>>& adj;
  std::map<int, std::pair<int, int>>& matched;

  bool backtrack(int i) {
    while (i < (int)need_atoms.size() && matched.count(need_atoms[i])) ++i;
    if (i >= (int)need_atoms.size()) return true;
    int v = need_atoms[i];
    auto it = adj.find(v);
    if (it != adj.end()) {
      for (const auto& ub : it->second) {
        int u = ub.first, bi = ub.second;
        if (matched.count(u)) continue;
        matched[v] = {u, bi};
        matched[u] = {v, bi};
        if (backtrack(i + 1)) return true;
        matched.erase(v);
        matched.erase(u);
      }
    }
    return false;
  }
};

inline void kekulize(Mol& mol) {
  std::vector<int> arom_bonds;
  for (int i = 0; i < mol.num_bonds(); ++i)
    if (mol.bonds[i].aromatic) arom_bonds.push_back(i);
  if (arom_bonds.empty()) return;

  std::set<int> arom_atom_set;
  for (int bi : arom_bonds) {
    arom_atom_set.insert(mol.bonds[bi].a);
    arom_atom_set.insert(mol.bonds[bi].b);
  }
  std::vector<int> arom_atoms(arom_atom_set.begin(), arom_atom_set.end());

  std::map<int, bool> needs;
  for (int idx : arom_atoms) needs[idx] = needs_pi_bond(mol, idx);

  for (int bi : arom_bonds) mol.bonds[bi].order = 1;

  std::vector<int> need_atoms;
  for (int a : arom_atoms)
    if (needs[a]) need_atoms.push_back(a);
  if (need_atoms.empty()) return;

  std::set<int> need_set(need_atoms.begin(), need_atoms.end());
  std::map<int, std::vector<std::pair<int, int>>> adj;
  for (int a : need_atoms) adj[a];  // pre-create, like the dict comp
  for (int bi : arom_bonds) {
    const Bond& b = mol.bonds[bi];
    if (need_set.count(b.a) && need_set.count(b.b)) {
      adj[b.a].push_back({b.b, bi});
      adj[b.b].push_back({b.a, bi});
    }
  }

  std::map<int, std::pair<int, int>> matched;
  KekulizeState st{need_atoms, adj, matched};
  if (!st.backtrack(0)) throw MolException{"kekulization failed"};

  std::set<int> done;
  for (const auto& kv : matched) {
    int bi = kv.second.second;
    if (done.count(bi)) continue;
    done.insert(bi);
    mol.bonds[bi].order = 2;
  }
}

inline void sanitize(Mol& mol) {
  kekulize(mol);
  mol.assign_implicit_hydrogens();
}

// ---------------------------------------------------------------------------
// Tetrahedral stereo (chem/stereo.py)
// ---------------------------------------------------------------------------

inline int perm_parity(const std::vector<int>& v) {
  int n = (int)v.size(), inv = 0;
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j)
      if (v[j] < v[i]) ++inv;
  return inv & 1;
}

inline std::vector<int> reference_order(const Mol& mol, int idx) {
  std::vector<int> nbrs = mol.neighbors(idx);
  std::sort(nbrs.begin(), nbrs.end());
  if ((int)nbrs.size() < 4) nbrs.push_back(VIRTUAL);
  return nbrs;
}

inline int map_parity(int tag, const std::vector<int>& from_order,
                      const std::vector<int>& to_order) {
  if (tag == 0) return 0;
  if (from_order.size() != to_order.size()) return 0;
  std::vector<int> fs(from_order), ts(to_order);
  std::sort(fs.begin(), fs.end());
  std::sort(ts.begin(), ts.end());
  if (fs != ts) return 0;
  std::vector<int> perm;
  perm.reserve(to_order.size());
  for (int x : to_order) {
    for (int i = 0; i < (int)from_order.size(); ++i)
      if (from_order[i] == x) { perm.push_back(i); break; }
  }
  return perm_parity(perm) ? 3 - tag : tag;
}

struct P3 { double x, y, z; bool valid; };

// parity_from_positions — chem/stereo.py:72-109.
inline int parity_from_positions(double cx, double cy, double cz,
                                 const std::vector<P3>& ordered) {
  std::vector<P3> pts;
  for (const P3& p : ordered)
    if (p.valid) pts.push_back(p);
  if ((int)pts.size() < 3) return 0;
  double ox, oy, oz;
  if ((int)pts.size() >= 4) { ox = pts[3].x; oy = pts[3].y; oz = pts[3].z; }
  else { ox = cx; oy = cy; oz = cz; }
  double u[3][3];
  for (int i = 0; i < 3; ++i) {
    u[i][0] = pts[i].x - ox;
    u[i][1] = pts[i].y - oy;
    u[i][2] = pts[i].z - oz;
  }
  double t = u[0][0] * (u[1][1] * u[2][2] - u[1][2] * u[2][1])
           - u[0][1] * (u[1][0] * u[2][2] - u[1][2] * u[2][0])
           + u[0][2] * (u[1][0] * u[2][1] - u[1][1] * u[2][0]);
  double m = 0;
  for (int i = 0; i < 3; ++i)
    for (int k = 0; k < 2; ++k)
      m = std::max(m, std::fabs(u[i][k]));
  double thr = std::max(1e-2 * m * m, 1e-12);
  if (std::fabs(t) < thr) return 0;
  return t > 0 ? 1 : 2;
}

// assign_parities_from_wedges — chem/stereo.py:112-156.
inline int assign_parities_from_wedges(Mol& mol) {
  int assigned = 0;
  for (int idx = 0; idx < mol.num_atoms(); ++idx) {
    Atom& a = mol.atoms[idx];
    int deg = mol.degree(idx);
    if (deg < 3 || deg > 4 || a.aromatic) continue;
    bool sp3 = true;
    for (int bi : mol.adj[idx]) {
      const Bond& b = mol.bonds[bi];
      if (b.order != 1 || b.aromatic) { sp3 = false; break; }
    }
    if (!sp3) continue;
    std::map<int, double> z;
    bool any_wedge = false;
    for (int bi : mol.adj[idx]) {
      const Bond& b = mol.bonds[bi];
      int j = b.other(idx);
      if (b.stereo == STEREO_WEDGE && b.a == idx) { z[j] = 1.0; any_wedge = true; }
      else if (b.stereo == STEREO_HASH && b.a == idx) { z[j] = -1.0; any_wedge = true; }
      else z[j] = 0.0;
    }
    if (!any_wedge) continue;
    std::vector<int> order = reference_order(mol, idx);
    std::vector<P3> positions;
    for (int nb : order) {
      if (nb == VIRTUAL) positions.push_back({0, 0, 0, false});
      else {
        const Atom& nba = mol.atoms[nb];
        positions.push_back({nba.x, nba.y, z[nb], true});
      }
    }
    int tag = parity_from_positions(a.x, a.y, 0.0, positions);
    if (tag) { a.parity = tag; ++assigned; }
  }
  return assigned;
}

// ---------------------------------------------------------------------------
// E/Z stereo (chem/ez.py)
// ---------------------------------------------------------------------------

inline bool reference_substituents(const Mol& mol, int bi, int* rx, int* ry) {
  const Bond& bond = mol.bonds[bi];
  int mx = -2, my = -2;
  for (int bj : mol.adj[bond.a]) {
    int n = mol.bonds[bj].other(bond.a);
    if (n != bond.b && (mx == -2 || n < mx)) mx = n;
  }
  for (int bj : mol.adj[bond.b]) {
    int n = mol.bonds[bj].other(bond.b);
    if (n != bond.a && (my == -2 || n < my)) my = n;
  }
  if (mx == -2 || my == -2) return false;
  *rx = mx; *ry = my;
  return true;
}

inline int ez_for_pair(const Mol& mol, int bi, int x, int y) {
  const Bond& bond = mol.bonds[bi];
  if (bond.ez == EZ_NONE) return EZ_NONE;
  int rx, ry;
  if (!reference_substituents(mol, bi, &rx, &ry)) return EZ_NONE;
  int flips = (x != rx) + (y != ry);
  return flips % 2 == 0 ? bond.ez : 3 - bond.ez;
}

inline void set_ez_from_pair(Mol& mol, int bi, int x, int y, int rel) {
  int rx, ry;
  if (!reference_substituents(mol, bi, &rx, &ry) || rel == EZ_NONE) return;
  int flips = (x != rx) + (y != ry);
  mol.bonds[bi].ez = flips % 2 == 0 ? rel : 3 - rel;
}

// assign_ez_from_coords — chem/ez.py:67-119.
inline int assign_ez_from_coords(Mol& mol) {
  std::vector<bool> ring = mol.ring_bond_flags();
  int assigned = 0;
  for (int bi = 0; bi < mol.num_bonds(); ++bi) {
    Bond& bond = mol.bonds[bi];
    if (bond.order != 2 || bond.aromatic || ring[bi]) continue;
    const Atom& a = mol.atoms[bond.a];
    const Atom& b = mol.atoms[bond.b];
    std::vector<int> xs, ys;
    for (int bj : mol.adj[bond.a]) {
      int n = mol.bonds[bj].other(bond.a);
      if (n != bond.b) xs.push_back(n);
    }
    for (int bj : mol.adj[bond.b]) {
      int n = mol.bonds[bj].other(bond.b);
      if (n != bond.a) ys.push_back(n);
    }
    if (xs.empty() || ys.empty()) continue;
    double dx = b.x - a.x, dy = b.y - a.y;
    auto side = [&](int n, const Atom& end) {
      const Atom& p = mol.atoms[n];
      return dx * (p.y - end.y) - dy * (p.x - end.x);
    };
    std::vector<std::pair<int, double>> s_a, s_b;
    for (int n : xs) s_a.push_back({n, side(n, a)});
    for (int n : ys) s_b.push_back({n, side(n, b)});
    double m = std::max(std::fabs(dx), std::fabs(dy));
    for (int n : xs) {
      m = std::max(m, std::fabs(mol.atoms[n].x - a.x));
      m = std::max(m, std::fabs(mol.atoms[n].y - a.y));
    }
    for (int n : ys) {
      m = std::max(m, std::fabs(mol.atoms[n].x - b.x));
      m = std::max(m, std::fabs(mol.atoms[n].y - b.y));
    }
    double thr = std::max(1e-2 * m * m, 1e-12);
    bool degenerate = false;
    for (const auto& p : s_a) if (std::fabs(p.second) < thr) degenerate = true;
    for (const auto& p : s_b) if (std::fabs(p.second) < thr) degenerate = true;
    if (degenerate) continue;
    if (s_a.size() == 2 && (s_a[0].second > 0) == (s_a[1].second > 0)) continue;
    if (s_b.size() == 2 && (s_b[0].second > 0) == (s_b[1].second > 0)) continue;
    // min over (n, side) pairs — Python tuple order: lowest atom index.
    auto mn = [](std::vector<std::pair<int, double>>& v) {
      auto best = v[0];
      for (const auto& p : v)
        if (p.first < best.first ||
            (p.first == best.first && p.second < best.second)) best = p;
      return best;
    };
    auto pa = mn(s_a);
    auto pb = mn(s_b);
    int rel = ((pa.second > 0) == (pb.second > 0)) ? EZ_CIS : EZ_TRANS;
    set_ez_from_pair(mol, bi, pa.first, pb.first, rel);
    ++assigned;
  }
  return assigned;
}

// ---------------------------------------------------------------------------
// Canonical ranks (chem/smiles.py:256-310)
// ---------------------------------------------------------------------------

typedef std::vector<std::vector<std::pair<int, int>>> Adjacency;

inline Adjacency make_adjacency(const Mol& mol) {
  Adjacency adj(mol.num_atoms());
  for (int i = 0; i < mol.num_atoms(); ++i) {
    adj[i].reserve(mol.adj[i].size());
    for (int bi : mol.adj[i]) {
      const Bond& b = mol.bonds[bi];
      adj[i].push_back({b.aromatic ? 4 : b.order, b.other(i)});
    }
  }
  return adj;
}

inline void refine(const Mol& mol, std::vector<int>& ranks,
                   const Adjacency& adj) {
  int n = mol.num_atoms();
  std::vector<std::vector<std::pair<int, int>>> nbr_keys(n);
  std::vector<int> order(n), new_ranks(n);
  while (true) {
    for (int i = 0; i < n; ++i) {
      nbr_keys[i].clear();
      for (const auto& bkj : adj[i])
        nbr_keys[i].push_back({bkj.first, ranks[bkj.second]});
      std::sort(nbr_keys[i].begin(), nbr_keys[i].end());
    }
    for (int i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
      if (ranks[a] != ranks[b]) return ranks[a] < ranks[b];
      return nbr_keys[a] < nbr_keys[b];
    });
    int r = 0;
    for (int j = 0; j < n; ++j) {
      int i = order[j];
      if (j > 0) {
        int p = order[j - 1];
        if (ranks[i] != ranks[p] || nbr_keys[i] != nbr_keys[p]) r = j;
      }
      new_ranks[i] = r;
    }
    if (new_ranks == ranks) return;
    ranks = new_ranks;
  }
}

struct InitialInvariant {
  int atomic_number, degree, charge, total_hs;
  bool aromatic, ring;

  bool operator<(const InitialInvariant& o) const {
    if (atomic_number != o.atomic_number) return atomic_number < o.atomic_number;
    if (degree != o.degree) return degree < o.degree;
    if (charge != o.charge) return charge < o.charge;
    if (total_hs != o.total_hs) return total_hs < o.total_hs;
    if (aromatic != o.aromatic) return aromatic < o.aromatic;
    return ring < o.ring;
  }
  bool operator==(const InitialInvariant& o) const {
    return atomic_number == o.atomic_number && degree == o.degree &&
           charge == o.charge && total_hs == o.total_hs &&
           aromatic == o.aromatic && ring == o.ring;
  }
};

inline std::vector<int> canonical_ranks(const Mol& mol,
                                        const Adjacency& adj) {
  int n = mol.num_atoms();
  std::vector<InitialInvariant> inv(n);
  std::vector<bool> ring = mol.ring_atom_flags();
  for (int i = 0; i < n; ++i) {
    const Atom& a = mol.atoms[i];
    inv[i] = {a.atomic_number(), mol.degree(i), a.charge, a.total_hs(),
              a.aromatic, (bool)ring[i]};
  }
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return inv[a] < inv[b]; });
  std::vector<int> ranks(n);
  int r = 0;
  for (int j = 0; j < n; ++j) {
    int i = order[j];
    if (j > 0 && !(inv[i] == inv[order[j - 1]])) r = j;
    ranks[i] = r;
  }
  refine(mol, ranks, adj);
  return ranks;
}

// ---------------------------------------------------------------------------
// Stereo-refined ranks + non-stereogenic pruning (chem/stereo.py:164-274)
// ---------------------------------------------------------------------------

inline int atom_descriptor(const Mol& mol, int idx,
                           const std::vector<int>& ranks) {
  int p = mol.atoms[idx].parity;
  if (!p) return 0;
  std::vector<int> nbrs = mol.neighbors(idx);
  std::set<int> rs;
  for (int n : nbrs) rs.insert(ranks[n]);
  if ((int)rs.size() != (int)nbrs.size()) return 0;
  std::vector<int> target(nbrs);
  std::stable_sort(target.begin(), target.end(),
                   [&](int a, int b) { return ranks[a] < ranks[b]; });
  if ((int)target.size() < 4) target.push_back(VIRTUAL);
  return map_parity(p, reference_order(mol, idx), target);
}

inline int ez_descriptor(const Mol& mol, int bi,
                         const std::vector<int>& ranks) {
  const Bond& b = mol.bonds[bi];
  if (!b.ez) return 0;
  int picks[2];
  int ends[2][2] = {{b.a, b.b}, {b.b, b.a}};
  for (int e = 0; e < 2; ++e) {
    int end = ends[e][0], other = ends[e][1];
    std::vector<int> subs;
    for (int bj : mol.adj[end]) {
      int n = mol.bonds[bj].other(end);
      if (n != other) subs.push_back(n);
    }
    std::set<int> rs;
    for (int n : subs) rs.insert(ranks[n]);
    if (rs.size() != subs.size()) return 0;
    int best = subs[0];
    for (int n : subs)
      if (ranks[n] > ranks[best]) best = n;
    picks[e] = best;
  }
  return ez_for_pair(mol, bi, picks[0], picks[1]);
}

inline std::vector<int> stereo_refined_ranks(const Mol& mol) {
  int n = mol.num_atoms();
  Adjacency adj = make_adjacency(mol);
  std::vector<int> ranks = canonical_ranks(mol, adj);
  while (true) {
    std::vector<int> a_desc(n);
    for (int i = 0; i < n; ++i) a_desc[i] = atom_descriptor(mol, i, ranks);
    std::vector<std::vector<int>> e_desc(n);
    for (int bi = 0; bi < mol.num_bonds(); ++bi) {
      int d = ez_descriptor(mol, bi, ranks);
      if (d) {
        e_desc[mol.bonds[bi].a].push_back(d);
        e_desc[mol.bonds[bi].b].push_back(d);
      }
    }
    for (int i = 0; i < n; ++i) std::sort(e_desc[i].begin(), e_desc[i].end());
    std::vector<int> order(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    auto less = [&](int a, int b) {
      if (ranks[a] != ranks[b]) return ranks[a] < ranks[b];
      if (a_desc[a] != a_desc[b]) return a_desc[a] < a_desc[b];
      return e_desc[a] < e_desc[b];
    };
    auto eq = [&](int a, int b) {
      return ranks[a] == ranks[b] && a_desc[a] == a_desc[b] &&
             e_desc[a] == e_desc[b];
    };
    std::stable_sort(order.begin(), order.end(), less);
    std::vector<int> new_ranks(n);
    int r = 0;
    for (int j = 0; j < n; ++j) {
      int i = order[j];
      if (j > 0 && !eq(i, order[j - 1])) r = j;
      new_ranks[i] = r;
    }
    refine(mol, new_ranks, adj);
    if (new_ranks == ranks) return ranks;
    ranks = new_ranks;
  }
}

inline int prune_nonstereogenic(Mol& mol) {
  bool any = false;
  for (const Atom& a : mol.atoms)
    if (a.parity) { any = true; break; }
  if (!any)
    for (const Bond& b : mol.bonds)
      if (b.ez) { any = true; break; }
  if (!any) return 0;
  int cleared = 0;
  while (true) {
    std::vector<int> ranks = stereo_refined_ranks(mol);
    bool changed = false;
    for (int idx = 0; idx < mol.num_atoms(); ++idx) {
      Atom& a = mol.atoms[idx];
      if (!a.parity) continue;
      std::vector<int> nbrs = mol.neighbors(idx);
      std::set<int> rs;
      for (int n : nbrs) rs.insert(ranks[n]);
      if (rs.size() != nbrs.size()) {
        a.parity = 0;
        ++cleared;
        changed = true;
      }
    }
    for (int bi = 0; bi < mol.num_bonds(); ++bi) {
      Bond& b = mol.bonds[bi];
      if (!b.ez) continue;
      bool ok = true;
      int ends[2][2] = {{b.a, b.b}, {b.b, b.a}};
      for (int e = 0; e < 2; ++e) {
        std::vector<int> subs;
        for (int bj : mol.adj[ends[e][0]]) {
          int n = mol.bonds[bj].other(ends[e][0]);
          if (n != ends[e][1]) subs.push_back(n);
        }
        std::set<int> rs;
        for (int n : subs) rs.insert(ranks[n]);
        if (rs.size() != subs.size()) ok = false;
      }
      if (!ok) {
        b.ez = 0;
        ++cleared;
        changed = true;
      }
    }
    if (!changed) return cleared;
  }
}

// ---------------------------------------------------------------------------
// Explicit-H removal (chem/mol.py:293-345)
// ---------------------------------------------------------------------------

inline Mol remove_explicit_h_atoms(const Mol& mol) {
  std::vector<int> keep;
  for (int i = 0; i < mol.num_atoms(); ++i) {
    const Atom& a = mol.atoms[i];
    bool plain_h = a.sym == S_H && a.charge == 0 && mol.degree(i) == 1 &&
                   mol.atoms[mol.neighbors(i)[0]].sym != S_H;
    if (!plain_h) keep.push_back(i);
  }
  if ((int)keep.size() == mol.num_atoms()) return mol;
  std::vector<int> remap(mol.num_atoms(), -1);
  for (int ni = 0; ni < (int)keep.size(); ++ni) remap[keep[ni]] = ni;
  Mol out;
  for (int old : keep) {
    Atom a = mol.atoms[old];
    a.parity = 0;  // re-mapped below
    out.add_atom(a);
  }
  std::vector<std::pair<std::pair<int, int>, int>> ez_transfer;  // (old_bi,new_bi),ez
  for (int bi = 0; bi < mol.num_bonds(); ++bi) {
    const Bond& b = mol.bonds[bi];
    if (remap[b.a] >= 0 && remap[b.b] >= 0) {
      int nbi = out.add_bond(remap[b.a], remap[b.b], b.order, b.aromatic,
                             b.stereo);
      if (b.ez) ez_transfer.push_back({{bi, nbi}, b.ez});
    }
  }
  for (int old : keep) {
    int p = mol.atoms[old].parity;
    if (!p) continue;
    std::vector<int> old_ref = reference_order(mol, old);
    std::vector<int> mapped;
    for (int x : old_ref)
      mapped.push_back((x == VIRTUAL || remap[x] < 0) ? VIRTUAL : remap[x]);
    std::vector<int> new_ref = reference_order(out, remap[old]);
    out.atoms[remap[old]].parity = map_parity(p, mapped, new_ref);
  }
  for (const auto& t : ez_transfer) {
    int old_bi = t.first.first, nbi = t.first.second, ez = t.second;
    int rx, ry;
    if (reference_substituents(mol, old_bi, &rx, &ry) && remap[rx] >= 0 &&
        remap[ry] >= 0) {
      // set_ez_from_pair reads Bond.ez via the STORED relation for the
      // OLD pair: ez_for_pair on the old mol with the reference pair is
      // just `ez` itself (flips = 0), so pass it through.
      set_ez_from_pair(out, nbi, remap[rx], remap[ry], ez);
    }
  }
  out.assign_implicit_hydrogens();
  return out;
}

// ---------------------------------------------------------------------------
// SMILES writer (chem/smiles.py:417-698)
// ---------------------------------------------------------------------------

inline std::string digit_str(int d) {
  if (d < 10) return std::string(1, (char)('0' + d));
  char buf[16];
  std::snprintf(buf, sizeof buf, "%%%02d", d);
  return buf;
}

inline std::string lower(const char* s) {
  std::string out(s);
  for (char& c : out) c = (char)std::tolower((unsigned char)c);
  return out;
}

inline std::string atom_token(const Mol& mol, int idx, bool kekule,
                              const std::string& chiral_tag) {
  const Atom& a = mol.atoms[idx];
  const char* sym = kElements[a.sym].name;
  bool aromatic = a.aromatic && !kekule;
  int order_sum = mol.bond_order_sum(idx);
  bool bare_ok = false;
  if (a.charge == 0 && chiral_tag.empty()) {
    if (aromatic) {
      int deg = mol.degree(idx);
      if (a.sym == S_C) bare_ok = a.total_hs() == std::max(0, 3 - deg);
      else if (a.sym == S_N || a.sym == S_P) bare_ok = a.total_hs() == 0;
      else if (a.sym == S_O || a.sym == S_S)
        bare_ok = a.total_hs() == 0 && kElements[a.sym].organic_subset;
      else if (a.sym == S_B) bare_ok = a.total_hs() == 0;
    } else if (kElements[a.sym].organic_subset) {
      bare_ok = a.total_hs() == implicit_hydrogens(a.sym, 0, order_sum);
    }
  }
  if (bare_ok) return aromatic ? lower(sym) : std::string(sym);
  std::string body = (aromatic && kElements[a.sym].aromatic_ok)
                         ? lower(sym) : std::string(sym);
  body += chiral_tag;
  int h = a.total_hs();
  if (h == 1) body += "H";
  else if (h > 1) { body += "H"; body += std::to_string(h); }
  if (a.charge == 1) body += "+";
  else if (a.charge == -1) body += "-";
  else if (a.charge > 1) { body += "+"; body += std::to_string(a.charge); }
  else if (a.charge < -1) { body += "-"; body += std::to_string(-a.charge); }
  return "[" + body + "]";
}

inline std::string bond_token(const Mol& mol, const Bond& bond, bool kekule) {
  if (bond.aromatic && !kekule) return "";
  if (bond.order == 1) {
    bool a_arom = mol.atoms[bond.a].aromatic;
    bool b_arom = mol.atoms[bond.b].aromatic;
    if (a_arom && b_arom && !bond.aromatic && !kekule) return "-";
    return "";
  }
  if (bond.order == 2) return "=";
  if (bond.order == 3) return "#";
  return "";
}

struct WriteCtx {
  std::vector<std::vector<std::pair<int, int>>> nbr;  // (u, bi) bond-index order
  std::vector<std::string> atom_tok;  // cached when parity == 0
  std::vector<bool> atom_cached;
  std::vector<std::string> bond_tok;

  WriteCtx(const Mol& mol, bool kekule) {
    int n = mol.num_atoms();
    nbr.resize(n);
    for (int bi = 0; bi < mol.num_bonds(); ++bi) {
      const Bond& b = mol.bonds[bi];
      nbr[b.a].push_back({b.b, bi});
      nbr[b.b].push_back({b.a, bi});
    }
    atom_tok.resize(n);
    atom_cached.resize(n, false);
    for (int v = 0; v < n; ++v) {
      if (!mol.atoms[v].parity) {
        atom_tok[v] = atom_token(mol, v, kekule, "");
        atom_cached[v] = true;
      }
    }
    bond_tok.reserve(mol.num_bonds());
    for (const Bond& b : mol.bonds) bond_tok.push_back(bond_token(mol, b, kekule));
  }
};

struct Writer {
  const Mol& mol;
  const std::vector<int>& ranks;
  bool kekule;
  const WriteCtx& ctx;

  std::map<int, int> ring_bond_digit;
  std::set<int> digit_free;
  std::vector<bool> visited;

  // per-fragment state
  std::map<int, int> parent_bond, parent_of;
  std::map<int, std::vector<std::pair<int, int>>> children, back_edges_at;
  std::map<int, int> dir_map;
  std::string out;

  Writer(const Mol& m, const std::vector<int>& r, bool k, const WriteCtx& c)
      : mol(m), ranks(r), kekule(k), ctx(c) {
    for (int d = 1; d < 100; ++d) digit_free.insert(d);
    visited.resize(m.num_atoms(), false);
  }

  std::string run() {
    int n = mol.num_atoms();
    std::vector<int> order_all(n);
    for (int i = 0; i < n; ++i) order_all[i] = i;
    std::stable_sort(order_all.begin(), order_all.end(),
                     [&](int a, int b) { return ranks[a] < ranks[b]; });
    std::string result;
    bool first = true;
    for (int root : order_all) {
      if (visited[root]) continue;
      std::string frag = write_fragment(root);
      if (!first) result += ".";
      result += frag;
      first = false;
    }
    return result;
  }

  // The preferred tree single bond at a double-bond end (chem/smiles.py
  // _end_candidate): returns false if none.
  bool end_candidate(int end, int skip_bi, int* nbr, int* bi, int* sign) {
    auto pit = parent_bond.find(end);
    if (pit != parent_bond.end() && pit->second != skip_bi) {
      const Bond& bond = mol.bonds[pit->second];
      if (bond.order == 1 && !bond.aromatic) {
        *nbr = parent_of[end];
        *bi = pit->second;
        *sign = +1;
        return true;
      }
    }
    auto cit = children.find(end);
    if (cit != children.end()) {
      std::vector<std::pair<int, int>> kids = cit->second;
      std::stable_sort(kids.begin(), kids.end(), [&](const auto& a, const auto& b) {
        return ranks[a.first] < ranks[b.first];
      });
      for (const auto& ub : kids) {
        const Bond& bond = mol.bonds[ub.second];
        if (ub.second != skip_bi && bond.order == 1 && !bond.aromatic) {
          *nbr = ub.first;
          *bi = ub.second;
          *sign = -1;
          return true;
        }
      }
    }
    return false;
  }

  std::string write_fragment(int root) {
    parent_bond.clear();
    parent_of.clear();
    children.clear();
    back_edges_at.clear();
    dir_map.clear();
    out.clear();

    // Pass 1: spanning tree + back edges in rank order.
    std::set<int> seen{root};
    std::set<int> seen_bonds;
    std::vector<int> stack{root};
    while (!stack.empty()) {
      int v = stack.back();
      stack.pop_back();
      std::vector<std::pair<int, int>> nbrs = ctx.nbr[v];
      std::stable_sort(nbrs.begin(), nbrs.end(), [&](const auto& a, const auto& b) {
        return ranks[a.first] < ranks[b.first];
      });
      for (auto it = nbrs.rbegin(); it != nbrs.rend(); ++it) {
        int u = it->first, bi = it->second;
        if (seen_bonds.count(bi)) continue;
        if (seen.count(u)) {
          seen_bonds.insert(bi);
          back_edges_at[v].push_back({u, bi});
          back_edges_at[u].push_back({v, bi});
        } else {
          seen_bonds.insert(bi);
          seen.insert(u);
          parent_bond[u] = bi;
          parent_of[u] = v;
          children[v].push_back({u, bi});
          stack.push_back(u);
        }
      }
    }

    // Direction assignment for cis/trans doubles.
    std::vector<int> doubles;
    for (int bi : seen_bonds) {  // std::set iterates ascending — matches
      const Bond& b = mol.bonds[bi];   // CPython small-int set order
      if (b.order == 2 && !b.aromatic && b.ez) doubles.push_back(bi);
    }
    std::stable_sort(doubles.begin(), doubles.end(), [&](int x, int y) {
      const Bond& bx = mol.bonds[x];
      const Bond& by = mol.bonds[y];
      int ax = std::min(ranks[bx.a], ranks[bx.b]);
      int bx2 = std::max(ranks[bx.a], ranks[bx.b]);
      int ay = std::min(ranks[by.a], ranks[by.b]);
      int by2 = std::max(ranks[by.a], ranks[by.b]);
      if (ax != ay) return ax < ay;
      return bx2 < by2;
    });
    for (int dbi : doubles) {
      const Bond& dbond = mol.bonds[dbi];
      int xa, ba_, sa, yb, bb_, sb;
      if (!end_candidate(dbond.a, dbi, &xa, &ba_, &sa)) continue;
      if (!end_candidate(dbond.b, dbi, &yb, &bb_, &sb)) continue;
      int rel = ez_for_pair(mol, dbi, xa, yb);
      if (rel == EZ_NONE) continue;
      bool want_equal = rel == EZ_CIS;
      int da = dir_map.count(ba_) ? dir_map[ba_] : 0;
      int db = dir_map.count(bb_) ? dir_map[bb_] : 0;
      int na = da * sa, nb = db * sb;
      if (na == 0 && nb == 0) {
        dir_map[ba_] = sa;
        dir_map[bb_] = (want_equal ? 1 : -1) * sb;
      } else if (na != 0 && nb == 0) {
        dir_map[bb_] = (want_equal ? na : -na) * sb;
      } else if (nb != 0 && na == 0) {
        dir_map[ba_] = (want_equal ? nb : -nb) * sa;
      } else {
        // over-constrained conjugated system: leave as is
        continue;
      }
    }

    emit(root);
    return out;
  }

  std::string chiral_tag(int v,
                         const std::vector<std::pair<int, int>>& ring_list,
                         const std::vector<std::pair<int, int>>& kid_list) {
    int parity = mol.atoms[v].parity;
    if (!parity) return "";
    std::vector<int> emission;
    auto pit = parent_of.find(v);
    if (pit != parent_of.end()) emission.push_back(pit->second);
    if (mol.atoms[v].total_hs() > 0) emission.push_back(VIRTUAL);
    for (const auto& ub : ring_list) emission.push_back(ub.first);
    for (const auto& ub : kid_list) emission.push_back(ub.first);
    if (emission.size() == 3 &&
        std::find(emission.begin(), emission.end(), VIRTUAL) ==
            emission.end())
      emission.push_back(VIRTUAL);
    int tag = map_parity(parity, reference_order(mol, v), emission);
    if (tag == 1) return "@";
    if (tag == 2) return "@@";
    return "";
  }

  void emit(int v) {
    visited[v] = true;
    std::vector<std::pair<int, int>> ring_list;
    auto rit = back_edges_at.find(v);
    if (rit != back_edges_at.end()) ring_list = rit->second;
    std::stable_sort(ring_list.begin(), ring_list.end(),
                     [&](const auto& a, const auto& b) {
                       return ranks[a.first] < ranks[b.first];
                     });
    std::vector<std::pair<int, int>> kid_list;
    auto cit = children.find(v);
    if (cit != children.end()) kid_list = cit->second;
    std::stable_sort(kid_list.begin(), kid_list.end(),
                     [&](const auto& a, const auto& b) {
                       return ranks[a.first] < ranks[b.first];
                     });
    if (ctx.atom_cached[v]) {
      out += ctx.atom_tok[v];
    } else {
      out += atom_token(mol, v, kekule, chiral_tag(v, ring_list, kid_list));
    }
    for (const auto& ub : ring_list) {
      int bi = ub.second;
      auto dit = ring_bond_digit.find(bi);
      if (dit != ring_bond_digit.end()) {
        int d = dit->second;
        ring_bond_digit.erase(dit);
        digit_free.insert(d);
        out += digit_str(d);
      } else {
        int d = *digit_free.begin();
        digit_free.erase(digit_free.begin());
        ring_bond_digit[bi] = d;
        out += ctx.bond_tok[bi];
        out += digit_str(d);
      }
    }
    for (size_t k = 0; k < kid_list.size(); ++k) {
      int u = kid_list[k].first, bi = kid_list[k].second;
      std::string btok = ctx.bond_tok[bi];
      auto dit = dir_map.find(bi);
      if (dit != dir_map.end() && mol.bonds[bi].order == 1 &&
          !mol.bonds[bi].aromatic)
        btok = dit->second > 0 ? "/" : "\\";
      if (k + 1 < kid_list.size()) {
        out += "(";
        out += btok;
        emit(u);
        out += ")";
      } else {
        out += btok;
        emit(u);
      }
    }
  }
};

inline std::string write_smiles(const Mol& mol, const std::vector<int>& ranks,
                                bool kekule, const WriteCtx& ctx) {
  Writer w(mol, ranks, kekule, ctx);
  return w.run();
}

// ---------------------------------------------------------------------------
// Canonical tie-break search with root-level orbit pruning
// (chem/smiles.py:313-410)
// ---------------------------------------------------------------------------

const int MAX_CANON_ATTEMPTS = 128;

struct AutUF {
  std::vector<int> p;
  explicit AutUF(int n) : p(n) {
    for (int i = 0; i < n; ++i) p[i] = i;
  }
  int find(int i) {
    int root = i;
    while (p[root] != root) root = p[root];
    while (p[i] != root) { int nx = p[i]; p[i] = root; i = nx; }
    return root;
  }
  void unite(int a, int b) {
    int ra = find(a), rb = find(b);
    if (ra != rb) p[std::max(ra, rb)] = std::min(ra, rb);
  }
};

struct CanonSearch {
  const Mol& mol;
  bool kekule;
  const Adjacency& adj;
  const WriteCtx& ctx;
  AutUF& aut;
  int budget;

  std::pair<std::string, std::vector<int>> search(
      std::vector<int> ranks, int depth) {
    int n = mol.num_atoms();
    std::set<int> distinct(ranks.begin(), ranks.end());
    if ((int)distinct.size() == n || budget <= 0)
      return {write_smiles(mol, ranks, kekule, ctx), ranks};
    // First tied class: smallest rank with >1 member; members in index
    // order.
    std::map<int, std::vector<int>> by_rank;
    for (int i = 0; i < n; ++i) by_rank[ranks[i]].push_back(i);
    int tied_rank = -1;
    for (const auto& kv : by_rank)
      if ((int)kv.second.size() > 1) { tied_rank = kv.first; break; }
    const std::vector<int>& members = by_rank[tied_rank];
    bool have_best = false;
    std::pair<std::string, std::vector<int>> best;
    std::vector<int> tried;
    for (int m : members) {
      if (budget <= 0 && have_best) break;
      if (depth == 0 && !tried.empty()) {
        int fm = aut.find(m);
        bool pruned = false;
        for (int t : tried)
          if (aut.find(t) == fm) { pruned = true; break; }
        if (pruned) continue;
      }
      tried.push_back(m);
      --budget;
      std::vector<int> trial(ranks);
      for (int i = 0; i < n; ++i) trial[i] *= 2;
      trial[m] -= 1;
      refine(mol, trial, adj);
      auto cand = search(std::move(trial), depth + 1);
      if (!have_best || cand.first < best.first) {
        best = std::move(cand);
        have_best = true;
      } else if (cand.first == best.first) {
        const std::vector<int>& rb = best.second;
        const std::vector<int>& rc = cand.second;
        std::set<int> sb(rb.begin(), rb.end());
        std::set<int> sc(rc.begin(), rc.end());
        if ((int)sb.size() == n && (int)sc.size() == n) {
          std::vector<int> inv_b(n);
          for (int i = 0; i < n; ++i) inv_b[rb[i]] = i;
          for (int i = 0; i < n; ++i) aut.unite(i, inv_b[rc[i]]);
        }
      }
    }
    return best;
  }
};

inline std::string to_smiles_canonical(const Mol& mol) {
  if (mol.num_atoms() == 0) return "";
  Adjacency adj = make_adjacency(mol);
  std::vector<int> ranks = canonical_ranks(mol, adj);
  WriteCtx ctx(mol, /*kekule=*/false);
  AutUF aut(mol.num_atoms());
  CanonSearch cs{mol, false, adj, ctx, aut, MAX_CANON_ATTEMPTS};
  return cs.search(ranks, 0).first;
}

// ---------------------------------------------------------------------------
// Decode-tail molecule construction (infer/assemble.py:_graph_to_smiles
// + chem/molblock.py write/parse semantics, without the text round-trip)
// ---------------------------------------------------------------------------

// %.4f-parity rounding: write_molblock formats coordinates with %.4f
// and parse_molblock reads them back — replicate via snprintf to keep
// the stereo thresholds bit-identical to the Python path.
inline double round4(double v) {
  char buf[32];
  std::snprintf(buf, sizeof buf, "%.4f", v);
  return std::atof(buf);
}

// Build + canonicalize one decoded graph. Returns false on failure
// (the reference's MolFromMolBlock -> None class).
inline bool graph_to_smiles_once(
    int na, const double* pos, const int32_t* type_cls,
    const int32_t* charge_cls, const int32_t* hs, int nb,
    const int32_t* bond_pairs, const int32_t* orders, bool perceive_stereo,
    std::string* out_smiles) {
  try {
    // impl_h collection — assemble.py:_graph_to_smiles_once:110-116
    // (1-based atoms, first-seen order, aromatic-bond endpoints that are
    // hetero and carry the hs flag).
    std::vector<int> impl_h;
    for (int i = 0; i < nb; ++i) {
      if (orders[i] != 4) continue;
      int ends[2] = {bond_pairs[2 * i], bond_pairs[2 * i + 1]};
      for (int e = 0; e < 2; ++e) {
        int a0 = ends[e];  // 0-based here
        if (kVocabToSym[type_cls[a0]] != S_C && hs[a0] != 0 &&
            std::find(impl_h.begin(), impl_h.end(), a0) == impl_h.end())
          impl_h.push_back(a0);
      }
    }

    Mol mol;
    for (int i = 0; i < na; ++i) {
      Atom a;
      int cls = type_cls[i];
      a.sym = (cls >= 0 && cls < 14) ? kVocabToSym[cls] : S_C;
      a.charge = charge_cls[i] == 1 ? 1 : (charge_cls[i] == 2 ? -1 : 0);
      a.x = round4(pos[2 * i] / 60.0 - 1.0);
      a.y = round4(pos[2 * i + 1] / 60.0 - 1.0);
      mol.add_atom(a);
    }
    std::vector<int> arom_atoms;
    for (int i = 0; i < nb; ++i) {
      int a = bond_pairs[2 * i], b = bond_pairs[2 * i + 1];
      int order = orders[i];
      int stereo = STEREO_NONE;
      bool aromatic = false;
      if (order > 4) {
        stereo = order == 5 ? STEREO_WEDGE : STEREO_HASH;
        order = 1;
      } else if (order == 4) {
        aromatic = true;
        order = 1;
        arom_atoms.push_back(a);
        arom_atoms.push_back(b);
      }
      mol.add_bond(a, b, order, aromatic, stereo);
    }
    for (int a0 : impl_h) mol.atoms[a0].expl_hs = 1;  // IMPL_H1 Sgroup
    for (int a0 : arom_atoms) mol.atoms[a0].aromatic = true;

    sanitize(mol);
    Mol heavy = remove_explicit_h_atoms(mol);
    if (perceive_stereo) {
      assign_parities_from_wedges(heavy);
      assign_ez_from_coords(heavy);
      prune_nonstereogenic(heavy);
    }
    *out_smiles = to_smiles_canonical(heavy);
    return true;
  } catch (const MolException&) {
    return false;
  }
}

}  // namespace chem

extern "C" {

// Decoded graph -> canonical isomeric SMILES (the serving tail after
// assemble_graph). Inputs use assemble_graph's OUTPUT conventions:
//   pos        float64 [na, 2]  integer peak cells
//   type_cls   int32  [na]      14-class vocabulary indices
//   charge_cls int32  [na]      charge classes 0/1/2 (-> 0/+1/-1)
//   hs         int32  [na]
//   bond_pairs int32  [nb, 2]   0-based atom indices
//   orders     int32  [nb]      molblock orders 1..4, 5=wedge, 6=hash
// salvage_aromatic: on kekulization failure retry once with aromatic
// bonds demoted to single (assemble.py:_graph_to_smiles:100-104).
// Returns the SMILES length written to `out` (NUL-terminated), or -1
// when no molecule could be assembled (Python returns None), or -2 when
// the buffer is too small.
int32_t graph_to_smiles(const double* pos, const int32_t* type_cls,
                        const int32_t* charge_cls, const int32_t* hs,
                        int32_t na, const int32_t* bond_pairs,
                        const int32_t* orders, int32_t nb,
                        int32_t perceive_stereo, int32_t salvage_aromatic,
                        char* out, int32_t cap) {
  std::string smiles;
  bool ok = chem::graph_to_smiles_once(na, pos, type_cls, charge_cls, hs,
                                       nb, bond_pairs, orders,
                                       perceive_stereo != 0, &smiles);
  if (!ok && salvage_aromatic) {
    bool any4 = false;
    for (int i = 0; i < nb; ++i)
      if (orders[i] == 4) { any4 = true; break; }
    if (any4) {
      std::vector<int32_t> demoted(orders, orders + nb);
      for (int32_t& o : demoted)
        if (o == 4) o = 1;
      ok = chem::graph_to_smiles_once(na, pos, type_cls, charge_cls, hs,
                                      nb, bond_pairs, demoted.data(),
                                      perceive_stereo != 0, &smiles);
    }
  }
  if (!ok) return -1;
  if ((int32_t)smiles.size() + 1 > cap) return -2;
  std::memcpy(out, smiles.c_str(), smiles.size() + 1);
  return (int32_t)smiles.size();
}

}  // extern "C"
