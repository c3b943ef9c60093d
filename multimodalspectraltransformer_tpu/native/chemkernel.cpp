// chemkernel.cpp — native (C++) chemistry runtime for the TPU-native MMT
// framework.
//
// This is the host-side hot path of the generate->filter->canonicalize->
// fingerprint loop (reference touchpoints: RDKit calls in
// `mmt_result_test_functions_15_4.py:1051` filter_probs_and_valid_smiles_
// and_canonicolize, `dataloaders_pl_v15_4.py:436-443,652`,
// `helper_functions_pl_v15_4.py:421-520`). The reference leans on RDKit
// (third-party C++); this framework carries its own chemistry kernel with a
// pure-Python reference implementation (multimodalspectraltransformer_tpu/
// chem/) and this native mirror. The two are BIT-IDENTICAL by construction
// (same FNV-style hashes, same Morgan refinement, same writer), which the
// test suite asserts on a corpus — so Python is the spec and C++ is the
// speed.
//
// Also ships an exact rectangular Hungarian solver (Jonker-Volgenant style
// shortest-augmenting-path) as the CPU-exact counterpart of the device
// auction solver in rank/matching.py (reference:
// `similarity_functions_v15_4.py:735,958` scipy linear_sum_assignment).
//
// C ABI only — bound from Python with ctypes (no pybind11 in the image).
//
// Build: g++ -O2 -std=c++17 -fPIC -shared -pthread -o libmmtchem.so chemkernel.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <map>
#include <set>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Element data (mirror of chem/elements.py)
// ---------------------------------------------------------------------------

struct ElementInfo {
  double mono;
  double avg;
};

static const std::map<std::string, ElementInfo>& masses() {
  static const std::map<std::string, ElementInfo> m = {
      {"H", {1.00782503207, 1.008}},
      {"He", {4.002603254, 4.002602}},
      {"Li", {7.01600455, 6.94}},
      {"Be", {9.0121822, 9.0121831}},
      {"B", {11.0093054, 10.81}},
      {"C", {12.0, 12.011}},
      {"N", {14.0030740048, 14.007}},
      {"O", {15.99491461956, 15.999}},
      {"F", {18.99840322, 18.998403163}},
      {"Ne", {19.9924401754, 20.1797}},
      {"Na", {22.9897692809, 22.98976928}},
      {"Mg", {23.9850417, 24.305}},
      {"Al", {26.98153863, 26.9815385}},
      {"Si", {27.9769265325, 28.085}},
      {"P", {30.97376163, 30.973761998}},
      {"S", {31.972071, 32.06}},
      {"Cl", {34.96885268, 35.45}},
      {"Ar", {39.9623831225, 39.948}},
      {"K", {38.96370668, 39.0983}},
      {"Ca", {39.96259098, 40.078}},
      {"Ti", {47.9479463, 47.867}},
      {"Cr", {51.9405075, 51.9961}},
      {"Mn", {54.9380451, 54.938044}},
      {"Fe", {55.9349375, 55.845}},
      {"Co", {58.933195, 58.933194}},
      {"Ni", {57.9353429, 58.6934}},
      {"Cu", {62.9295975, 63.546}},
      {"Zn", {63.9291422, 65.38}},
      {"Ga", {68.9255736, 69.723}},
      {"Ge", {73.9211778, 72.63}},
      {"As", {74.9215965, 74.921595}},
      {"Se", {79.9165213, 78.971}},
      {"Br", {78.9183371, 79.904}},
      {"Kr", {83.911507, 83.798}},
      {"Rb", {84.911789738, 85.4678}},
      {"Sr", {87.9056121, 87.62}},
      {"Zr", {89.9047044, 91.224}},
      {"Mo", {97.9054082, 95.95}},
      {"Ru", {101.9043493, 101.07}},
      {"Rh", {102.905504, 102.9055}},
      {"Pd", {105.903486, 106.42}},
      {"Ag", {106.905097, 107.8682}},
      {"Cd", {113.9033585, 112.414}},
      {"In", {114.903878, 114.818}},
      {"Sn", {119.9021947, 118.71}},
      {"Sb", {120.9038157, 121.76}},
      {"Te", {129.9062244, 127.6}},
      {"I", {126.904473, 126.90447}},
      {"Xe", {131.9041535, 131.293}},
      {"Cs", {132.905451933, 132.90545196}},
      {"Ba", {137.9052472, 137.327}},
      {"W", {183.9509312, 183.84}},
      {"Pt", {194.9647911, 195.084}},
      {"Au", {196.9665687, 196.966569}},
      {"Hg", {201.970643, 200.592}},
      {"Tl", {204.9744275, 204.38}},
      {"Pb", {207.9766521, 207.2}},
      {"Bi", {208.9803987, 208.9804}},
      {"U", {238.0507882, 238.02891}},
  };
  return m;
}

static bool default_valences(const std::string& sym, std::vector<int>* out) {
  static const std::map<std::string, std::vector<int>> v = {
      {"B", {3}},  {"C", {4}},       {"N", {3}},  {"O", {2}},
      {"P", {3, 5}}, {"S", {2, 4, 6}}, {"F", {1}},  {"Cl", {1}},
      {"Br", {1}}, {"I", {1}},       {"H", {1}},
  };
  auto it = v.find(sym);
  if (it == v.end()) return false;
  *out = it->second;
  return true;
}

static bool is_organic_subset(const std::string& s) {
  return s == "B" || s == "C" || s == "N" || s == "O" || s == "P" ||
         s == "S" || s == "F" || s == "Cl" || s == "Br" || s == "I";
}

static bool aromatic_ok(const std::string& lower) {
  return lower == "b" || lower == "c" || lower == "n" || lower == "o" ||
         lower == "p" || lower == "s" || lower == "se" || lower == "as";
}

// ---------------------------------------------------------------------------
// Mol graph (mirror of chem/smiles.py)
// ---------------------------------------------------------------------------

struct Atom {
  std::string symbol;
  bool aromatic = false;
  int charge = 0;
  int explicit_h = -1;  // -1 = derive
  int isotope = 0;
  int implicit_h = 0;
  bool in_ring = false;
};

struct Bond {
  int a1, a2;
  int order;  // 1,2,3
  bool aromatic = false;
  bool in_ring = false;  // filled in by finalize/mark_rings
  int other(int i) const { return i == a1 ? a2 : a1; }
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int>> adjacency;  // atom -> bond indices

  int add_atom(Atom a) {
    atoms.push_back(std::move(a));
    adjacency.emplace_back();
    return (int)atoms.size() - 1;
  }
  void add_bond(int a1, int a2, int order, bool arom) {
    bonds.push_back({a1, a2, order, arom});
    adjacency[a1].push_back((int)bonds.size() - 1);
    adjacency[a2].push_back((int)bonds.size() - 1);
  }
  int degree(int i) const { return (int)adjacency[i].size(); }
  int bond_between(int a1, int a2) const {
    for (int bi : adjacency[a1])
      if (bonds[bi].other(a1) == a2) return bi;
    return -1;
  }
  int total_h(int i) const {
    const Atom& a = atoms[i];
    return a.explicit_h >= 0 ? a.explicit_h : a.implicit_h;
  }

  // Mirror of Mol.bond_order_sum (chem/smiles.py:99-124) including the
  // aromatic lone-pair conventions.
  double bond_order_sum(int i) const {
    const Atom& a = atoms[i];
    double total = 0.0;
    int n_arom = 0;
    bool has_exo_double = false;
    for (int bi : adjacency[i]) {
      const Bond& b = bonds[bi];
      if (b.aromatic) {
        n_arom++;
      } else {
        total += b.order;
        if (b.order == 2.0)
          has_exo_double = true;
      }
    }
    if (n_arom) {
      bool os_like = a.symbol == "O" || a.symbol == "S" || a.symbol == "Se" ||
                     a.symbol == "Te";
      bool np_like = a.symbol == "N" || a.symbol == "P";
      if (a.aromatic && os_like) {
        total += n_arom;
      } else if (a.aromatic && np_like &&
                 (a.explicit_h > 0 || degree(i) == 3)) {
        total += n_arom;
      } else if (a.aromatic && has_exo_double) {
        // exocyclic double bond carries the pi electron (pyridinone c(=O))
        total += n_arom;
      } else {
        total += n_arom + 1;
      }
    }
    return total;
  }
};

struct ParseError {};

static std::vector<int> effective_valences(const std::string& sym, int charge) {
  std::vector<int> base;
  if (!default_valences(sym, &base)) return {};
  if (charge == 0) return base;
  bool np_like = sym == "N" || sym == "P";
  bool os_like = sym == "O" || sym == "S";
  if (np_like && charge == 1) return {4};
  if (np_like && charge == -1) return {2};
  if (os_like && charge == 1) return {3};
  if (os_like && charge == -1) return {1};
  if (sym == "C" && (charge == 1 || charge == -1)) return {3};
  if (sym == "B" && charge == -1) return {4};
  std::vector<int> out;
  for (int v : base) out.push_back(std::max(0, v + charge));
  return out;
}

// Ring marking: a bond is a ring bond iff it is not a bridge (equivalent to
// the back-edge + fundamental-cycle marking in chem/smiles.py:_mark_rings).
static void mark_rings(Mol& mol) {
  int n = (int)mol.atoms.size();
  std::vector<int> disc(n, -1), low(n, 0);
  std::vector<bool> is_bridge(mol.bonds.size(), false);
  int timer = 0;
  // iterative Tarjan bridge-finding
  struct Frame {
    int v;
    int parent_bond;
    size_t edge_idx;
  };
  for (int root = 0; root < n; ++root) {
    if (disc[root] >= 0) continue;
    std::vector<Frame> stack;
    stack.push_back({root, -1, 0});
    disc[root] = low[root] = timer++;
    while (!stack.empty()) {
      Frame& f = stack.back();
      if (f.edge_idx < mol.adjacency[f.v].size()) {
        int bi = mol.adjacency[f.v][f.edge_idx++];
        if (bi == f.parent_bond) continue;
        int w = mol.bonds[bi].other(f.v);
        if (disc[w] < 0) {
          disc[w] = low[w] = timer++;
          stack.push_back({w, bi, 0});
        } else {
          low[f.v] = std::min(low[f.v], disc[w]);
        }
      } else {
        int v = f.v;
        int pb = f.parent_bond;
        stack.pop_back();
        if (pb >= 0) {
          int p = mol.bonds[pb].other(v);
          low[p] = std::min(low[p], low[v]);
          if (low[v] > disc[p]) is_bridge[pb] = true;
        }
      }
    }
  }
  for (size_t bi = 0; bi < mol.bonds.size(); ++bi) {
    Bond& b = mol.bonds[bi];
    b.in_ring = !is_bridge[bi];
    if (b.in_ring) {
      mol.atoms[b.a1].in_ring = true;
      mol.atoms[b.a2].in_ring = true;
    } else if (b.aromatic) {
      // Daylight semantics (mirror of chem/smiles.py:_mark_rings): a bond
      // between two aromatic atoms outside any ring is a SINGLE bond — an
      // implicitly-written biaryl link must not read as aromatic
      b.aromatic = false;
      b.order = 1;
    }
  }
}

// finalize: implicit H assignment + valence checks (chem/smiles.py:149-179)
static void finalize(Mol& mol, bool strict) {
  mark_rings(mol);
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    Atom& a = mol.atoms[i];
    double bos = mol.bond_order_sum((int)i);
    std::vector<int> vals = effective_valences(a.symbol, a.charge);
    if (a.explicit_h >= 0) {
      double total = bos + a.explicit_h;
      if (strict && !vals.empty() &&
          total > (double)*std::max_element(vals.begin(), vals.end()))
        throw ParseError{};
      a.implicit_h = 0;
      continue;
    }
    if (vals.empty()) {
      a.implicit_h = 0;
      continue;
    }
    int h = -1;
    for (int v : vals) {
      if (bos <= (double)v) {
        h = (int)((double)v - bos);
        break;
      }
    }
    if (h < 0) {
      if (strict) throw ParseError{};
      h = 0;
    }
    a.implicit_h = h;
  }
}

// ---------------------------------------------------------------------------
// SMILES parser (mirror of chem/smiles.py:parse_smiles/_parse_bracket)
// ---------------------------------------------------------------------------

static Atom parse_bracket(const std::string& body) {
  size_t i = 0, n = body.size();
  int isotope = 0;
  while (i < n && isdigit((unsigned char)body[i]))
    isotope = isotope * 10 + (body[i++] - '0');
  if (i >= n) throw ParseError{};
  bool aromatic = false;
  std::string sym;
  if (isupper((unsigned char)body[i])) {
    sym = body.substr(i, 1);
    i++;
    if (i < n && islower((unsigned char)body[i]) &&
        masses().count(sym + body[i])) {
      sym += body[i];
      i++;
    }
  } else if (islower((unsigned char)body[i])) {
    std::string two = body.substr(i, 2);
    if (two.size() == 2 && aromatic_ok(two)) {
      sym = std::string(1, (char)toupper(two[0])) + two.substr(1);
      i += 2;
    } else if (std::string("bcnops").find(body[i]) != std::string::npos) {
      sym = std::string(1, (char)toupper(body[i]));
      i += 1;
    } else {
      throw ParseError{};
    }
    aromatic = true;
  } else {
    throw ParseError{};
  }

  std::string chir;
  while (i < n && body[i] == '@') {
    chir += "@";
    i++;
  }
  if (i < n && !chir.empty()) {
    std::string two = body.substr(i, 2);
    if (two == "TH" || two == "AL" || two == "SP" || two == "TB" ||
        two == "OH") {
      i += 2;
      while (i < n && isdigit((unsigned char)body[i])) i++;
    }
  }

  int h = 0;
  if (i < n && body[i] == 'H') {
    i++;
    h = 1;
    std::string cnt;
    while (i < n && isdigit((unsigned char)body[i])) cnt += body[i++];
    if (!cnt.empty()) h = std::stoi(cnt);
  }

  int charge = 0;
  while (i < n && (body[i] == '+' || body[i] == '-')) {
    int sign = body[i] == '+' ? 1 : -1;
    i++;
    std::string cnt;
    while (i < n && isdigit((unsigned char)body[i])) cnt += body[i++];
    charge += sign * (cnt.empty() ? 1 : std::stoi(cnt));
  }

  if (i < n && body[i] == ':') {
    i++;
    while (i < n && isdigit((unsigned char)body[i])) i++;
  }

  if (i != n) throw ParseError{};
  if (!masses().count(sym)) throw ParseError{};
  Atom a;
  a.symbol = sym;
  a.aromatic = aromatic;
  a.charge = charge;
  a.explicit_h = h;
  a.isotope = isotope;
  return a;
}

static int bond_order_of(char c) {
  switch (c) {
    case '-': return 1;
    case '=': return 2;
    case '#': return 3;
    case ':': return 1;
  }
  return 1;
}

static Mol parse_smiles(const std::string& smiles, bool strict = true) {
  Mol mol;
  std::vector<int> prev;  // branch stack
  int last = -1;
  char pending = 0;  // 0 = none
  std::map<int, std::pair<int, char>> ring_open;
  size_t i = 0, n = smiles.size();

  auto attach = [&](int new_idx) {
    if (last >= 0) {
      char sym = pending;
      if (sym == 0) {
        bool arom = mol.atoms[last].aromatic && mol.atoms[new_idx].aromatic;
        mol.add_bond(last, new_idx, 1, arom);
      } else if (sym == '/' || sym == '\\') {
        mol.add_bond(last, new_idx, 1, false);
      } else if (sym == ':') {
        mol.add_bond(last, new_idx, 1, true);
      } else {
        mol.add_bond(last, new_idx, bond_order_of(sym), false);
      }
    }
    pending = 0;
    last = new_idx;
  };

  while (i < n) {
    char c = smiles[i];
    if (c == '(') {
      if (last < 0) throw ParseError{};
      prev.push_back(last);
      i++;
    } else if (c == ')') {
      if (prev.empty()) throw ParseError{};
      last = prev.back();
      prev.pop_back();
      i++;
    } else if (c == '-' || c == '=' || c == '#' || c == ':' || c == '/' ||
               c == '\\') {
      if (pending != 0) throw ParseError{};
      pending = c;
      i++;
    } else if (c == '.') {
      last = -1;
      pending = 0;
      i++;
    } else if (isdigit((unsigned char)c) || c == '%') {
      int num;
      if (c == '%') {
        if (i + 2 >= n || !isdigit((unsigned char)smiles[i + 1]) ||
            !isdigit((unsigned char)smiles[i + 2]))
          throw ParseError{};
        num = (smiles[i + 1] - '0') * 10 + (smiles[i + 2] - '0');
        i += 3;
      } else {
        num = c - '0';
        i += 1;
      }
      if (last < 0) throw ParseError{};
      auto it = ring_open.find(num);
      if (it != ring_open.end()) {
        int a1 = it->second.first;
        char sym1 = it->second.second;
        ring_open.erase(it);
        char sym = pending != 0 ? pending : sym1;
        if (a1 == last) throw ParseError{};
        if (mol.bond_between(a1, last) >= 0) throw ParseError{};
        if (sym == 0) {
          bool arom = mol.atoms[a1].aromatic && mol.atoms[last].aromatic;
          mol.add_bond(a1, last, 1, arom);
        } else if (sym == '/' || sym == '\\') {
          mol.add_bond(a1, last, 1, false);
        } else if (sym == ':') {
          mol.add_bond(a1, last, 1, true);
        } else {
          mol.add_bond(a1, last, bond_order_of(sym), false);
        }
        pending = 0;
      } else {
        ring_open[num] = {last, pending};
        pending = 0;
      }
    } else if (c == '[') {
      size_t j = smiles.find(']', i);
      if (j == std::string::npos) throw ParseError{};
      attach(mol.add_atom(parse_bracket(smiles.substr(i + 1, j - i - 1))));
      i = j + 1;
    } else {
      // organic subset
      if ((c == 'C' && i + 1 < n && smiles[i + 1] == 'l') ||
          (c == 'B' && i + 1 < n && smiles[i + 1] == 'r')) {
        Atom a;
        a.symbol = smiles.substr(i, 2);
        attach(mol.add_atom(a));
        i += 2;
      } else if (std::string("BCNOPSFI").find(c) != std::string::npos) {
        Atom a;
        a.symbol = std::string(1, c);
        attach(mol.add_atom(a));
        i += 1;
      } else if (std::string("bcnops").find(c) != std::string::npos) {
        Atom a;
        a.symbol = std::string(1, (char)toupper(c));
        a.aromatic = true;
        attach(mol.add_atom(a));
        i += 1;
      } else {
        throw ParseError{};
      }
    }
  }

  if (!prev.empty()) throw ParseError{};
  if (!ring_open.empty()) throw ParseError{};
  if (pending != 0) throw ParseError{};
  if (mol.atoms.empty()) throw ParseError{};
  finalize(mol, strict);
  return mol;
}

// ---------------------------------------------------------------------------
// Hashes — EXACT mirrors of chem/canonical.py:_hash and chem/fingerprint.py:_h
// ---------------------------------------------------------------------------

static const uint64_t FNV_OFFSET = 1469598103934665603ULL;
static const uint64_t FNV_PRIME = 1099511628211ULL;
static const uint64_t P61 = (1ULL << 61) - 1;
static const uint64_t MASK63 = (1ULL << 63) - 1;

// canonical hash: h ^= v; h = (h * FNV_PRIME) mod (2^61 - 1)
static uint64_t chash(const uint64_t* vals, size_t n) {
  uint64_t h = FNV_OFFSET;
  for (size_t i = 0; i < n; ++i) {
    h ^= vals[i];
    h = (uint64_t)(((__uint128_t)h * FNV_PRIME) % P61);
  }
  return h;
}

// fingerprint hash: acc ^= v; acc = (acc * FNV_PRIME) & (2^63 - 1)
static uint64_t fhash(const uint64_t* vals, size_t n) {
  uint64_t acc = FNV_OFFSET;
  for (size_t i = 0; i < n; ++i) {
    acc ^= vals[i];
    acc = (acc * FNV_PRIME) & MASK63;
  }
  return acc;
}

static uint64_t sym_code(const std::string& s) {
  return (uint64_t)s[0] * 256 + (s.size() > 1 ? (uint64_t)s[1] : 0);
}

// ---------------------------------------------------------------------------
// Canonical ranks (mirror of chem/canonical.py)
// ---------------------------------------------------------------------------

static std::vector<uint64_t> initial_invariants(const Mol& mol) {
  std::vector<uint64_t> inv;
  inv.reserve(mol.atoms.size());
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    const Atom& a = mol.atoms[i];
    uint64_t vals[8] = {
        (uint64_t)mol.degree((int)i),
        (uint64_t)(int64_t)llround(mol.bond_order_sum((int)i) * 2),
        sym_code(a.symbol),
        (uint64_t)(int64_t)(a.charge + 16),
        (uint64_t)mol.total_h((int)i),
        (uint64_t)(a.aromatic ? 1 : 0),
        (uint64_t)(a.in_ring ? 1 : 0),
        (uint64_t)a.isotope,
    };
    inv.push_back(chash(vals, 8));
  }
  return inv;
}

static std::vector<int> ranks_from_values(const std::vector<uint64_t>& inv) {
  std::vector<uint64_t> sorted_vals(inv.begin(), inv.end());
  std::sort(sorted_vals.begin(), sorted_vals.end());
  sorted_vals.erase(std::unique(sorted_vals.begin(), sorted_vals.end()),
                    sorted_vals.end());
  std::vector<int> ranks(inv.size());
  for (size_t i = 0; i < inv.size(); ++i)
    ranks[i] = (int)(std::lower_bound(sorted_vals.begin(), sorted_vals.end(),
                                      inv[i]) -
                     sorted_vals.begin());
  return ranks;
}

// one refinement sweep to fixpoint (or discrete); stop_at_discrete mirrors
// canonical_ranks' refine (true) vs symmetry_classes' refine (false)
static std::vector<int> refine(const Mol& mol, std::vector<int> ranks,
                               bool stop_at_discrete) {
  int n = (int)mol.atoms.size();
  while (true) {
    std::vector<std::pair<int, uint64_t>> keys(n);
    for (int i = 0; i < n; ++i) {
      std::vector<uint64_t> neigh;
      neigh.reserve(mol.adjacency[i].size());
      for (int bi : mol.adjacency[i]) {
        const Bond& b = mol.bonds[bi];
        uint64_t vals[3] = {(uint64_t)ranks[b.other(i)], (uint64_t)b.order,
                            (uint64_t)(b.aromatic ? 1 : 0)};
        neigh.push_back(chash(vals, 3));
      }
      std::sort(neigh.begin(), neigh.end());
      keys[i] = {ranks[i], chash(neigh.data(), neigh.size())};
    }
    std::vector<std::pair<int, uint64_t>> uniq(keys.begin(), keys.end());
    std::sort(uniq.begin(), uniq.end());
    uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
    std::vector<int> new_ranks(n);
    for (int i = 0; i < n; ++i)
      new_ranks[i] = (int)(std::lower_bound(uniq.begin(), uniq.end(),
                                            keys[i]) -
                           uniq.begin());
    bool same = new_ranks == ranks;
    bool discrete = (int)uniq.size() == n;
    ranks = std::move(new_ranks);
    if (same || (stop_at_discrete && discrete)) return ranks;
  }
}

static std::vector<int> canonical_ranks(const Mol& mol) {
  int n = (int)mol.atoms.size();
  std::vector<int> ranks =
      refine(mol, ranks_from_values(initial_invariants(mol)), true);
  while (true) {
    std::set<int> distinct(ranks.begin(), ranks.end());
    if ((int)distinct.size() >= n) break;
    // lowest tied class
    std::map<int, std::vector<int>> classes;
    for (int i = 0; i < n; ++i) classes[ranks[i]].push_back(i);
    int tied = -1;
    for (auto& kv : classes)
      if (kv.second.size() > 1) {
        tied = kv.first;
        break;
      }
    int chosen = classes[tied].front();
    std::vector<uint64_t> promoted(n);
    for (int i = 0; i < n; ++i)
      promoted[i] = (uint64_t)(ranks[i] * 2 + (i == chosen ? 0 : 1));
    ranks = refine(mol, ranks_from_values(promoted), true);
  }
  return ranks;
}

static std::vector<int> symmetry_classes_of(const Mol& mol) {
  return refine(mol, ranks_from_values(initial_invariants(mol)), false);
}

// ---------------------------------------------------------------------------
// SMILES writer (mirror of chem/canonical.py:write_smiles, ranks mode only)
// ---------------------------------------------------------------------------

// bond_order_sum as a RE-PARSER sees the atom when written WITHOUT
// brackets (explicit_h unset): the pyrrole-type aromatic-N/P branch then
// triggers only on degree 3 (mirror of chem/canonical.py
// _bare_bond_order_sum — keeps [nH] bracketed so pyrrole round-trips).
static double bare_bond_order_sum(const Mol& mol, int i) {
  const Atom& a = mol.atoms[i];
  double total = 0.0;
  int n_arom = 0;
  bool has_exo_double = false;
  for (int bi : mol.adjacency[i]) {
    const Bond& b = mol.bonds[bi];
    if (b.aromatic) {
      n_arom++;
    } else {
      total += b.order;
      if (b.order == 2.0)
        has_exo_double = true;
    }
  }
  if (n_arom) {
    bool os_like = a.symbol == "O" || a.symbol == "S" || a.symbol == "Se" ||
                   a.symbol == "Te";
    bool np_like = a.symbol == "N" || a.symbol == "P";
    if (a.aromatic && os_like) {
      total += n_arom;
    } else if (a.aromatic && np_like && mol.degree(i) == 3) {
      total += n_arom;
    } else if (a.aromatic && has_exo_double) {
      // exocyclic double bond carries the pi electron (pyridinone c(=O))
      total += n_arom;
    } else {
      total += n_arom + 1;
    }
  }
  return total;
}

static bool needs_brackets(const Mol& mol, int i) {
  const Atom& a = mol.atoms[i];
  if (!is_organic_subset(a.symbol) || a.charge != 0 || a.isotope) return true;
  if (a.explicit_h >= 0) {
    std::vector<int> vals;
    default_valences(a.symbol, &vals);
    double bos = bare_bond_order_sum(mol, i);
    int default_h = 0;
    for (int v : vals) {
      if (bos <= (double)v) {
        default_h = (int)((double)v - bos);
        break;
      }
    }
    return a.explicit_h != default_h;
  }
  return false;
}

static std::string atom_token(const Mol& mol, int i) {
  const Atom& a = mol.atoms[i];
  std::string sym = a.symbol;
  if (a.aromatic)
    for (auto& ch : sym) ch = (char)tolower(ch);
  if (!needs_brackets(mol, i)) return sym;
  std::string out = "[";
  if (a.isotope) out += std::to_string(a.isotope);
  out += sym;
  int h = mol.total_h(i);
  if (h == 1)
    out += "H";
  else if (h > 1)
    out += "H" + std::to_string(h);
  if (a.charge) {
    std::string sign = a.charge > 0 ? "+" : "-";
    int mag = std::abs(a.charge);
    out += mag == 1 ? sign : sign + std::to_string(mag);
  }
  out += "]";
  return out;
}

// Mirror of chem/canonical.py:_bond_token — the emitted prefix must
// re-parse to this bond: implicit reads back aromatic iff both endpoint
// atoms are aromatic, so ':' is explicit when an endpoint is not aromatic
// and '-' is explicit for single bonds between two aromatic atoms
// (biaryl / biphenylene; RDKit's output convention too).
static std::string bond_token(const Mol& mol, const Bond& b) {
  bool a1_ar = mol.atoms[b.a1].aromatic;
  bool a2_ar = mol.atoms[b.a2].aromatic;
  if (b.aromatic) return (a1_ar && a2_ar) ? "" : ":";
  switch (b.order) {
    case 2: return "=";
    case 3: return "#";
    default: return (a1_ar && a2_ar) ? "-" : "";
  }
}

struct Writer {
  const Mol& mol;
  const std::vector<int>& ranks;
  std::vector<bool> visited;
  std::vector<std::vector<std::pair<int, int>>> tree_children;  // (bond, child)
  std::vector<std::vector<int>> ring_at;
  std::set<int> ring_bonds;
  std::string out;
  std::map<int, int> ring_label;
  std::vector<int> free_labels;  // kept sorted ascending
  int next_label = 1;

  Writer(const Mol& m, const std::vector<int>& r)
      : mol(m),
        ranks(r),
        visited(m.atoms.size(), false),
        tree_children(m.atoms.size()),
        ring_at(m.atoms.size()) {}

  void dfs(int v, int pb) {
    visited[v] = true;
    std::vector<int> bonds;
    for (int bi : mol.adjacency[v])
      if (bi != pb) bonds.push_back(bi);
    std::stable_sort(bonds.begin(), bonds.end(), [&](int x, int y) {
      return ranks[mol.bonds[x].other(v)] < ranks[mol.bonds[y].other(v)];
    });
    for (int bi : bonds) {
      int w = mol.bonds[bi].other(v);
      if (visited[w]) {
        if (!ring_bonds.count(bi)) {
          ring_bonds.insert(bi);
          ring_at[v].push_back(bi);
          ring_at[w].push_back(bi);
        }
      } else {
        tree_children[v].push_back({bi, w});
        dfs(w, bi);
      }
    }
  }

  static std::string fmt_ring(int lbl) {
    if (lbl < 10) return std::to_string(lbl);
    if (lbl >= 100) throw ParseError{};  // '%100' would re-parse as 10 + 0
    char buf[8];
    snprintf(buf, sizeof buf, "%%%02d", lbl);
    return buf;
  }

  void emit(int v, int pb) {
    if (pb >= 0) out += bond_token(mol, mol.bonds[pb]);
    out += atom_token(mol, v);
    std::vector<int> digits = ring_at[v];
    std::stable_sort(digits.begin(), digits.end(), [&](int x, int y) {
      return ranks[mol.bonds[x].other(v)] < ranks[mol.bonds[y].other(v)];
    });
    for (int bi : digits) {
      auto it = ring_label.find(bi);
      if (it == ring_label.end()) {
        int lbl;
        if (!free_labels.empty()) {
          lbl = free_labels.front();
          free_labels.erase(free_labels.begin());
        } else {
          lbl = next_label++;
        }
        ring_label[bi] = lbl;
        out += bond_token(mol, mol.bonds[bi]) + fmt_ring(lbl);
      } else {
        int lbl = it->second;
        ring_label.erase(it);
        out += fmt_ring(lbl);
        free_labels.insert(
            std::lower_bound(free_labels.begin(), free_labels.end(), lbl),
            lbl);
      }
    }
    auto& kids = tree_children[v];
    for (size_t k = 0; k < kids.size(); ++k) {
      bool last_kid = k + 1 == kids.size();
      if (!last_kid) out += "(";
      emit(kids[k].second, kids[k].first);
      if (!last_kid) out += ")";
    }
  }

  std::string run() {
    int n = (int)mol.atoms.size();
    std::vector<int> roots;
    std::set<int> remaining;
    for (int i = 0; i < n; ++i) remaining.insert(i);
    while (!remaining.empty()) {
      int root = *remaining.begin();
      for (int i : remaining)
        if (ranks[i] < ranks[root]) root = i;
      roots.push_back(root);
      dfs(root, -1);
      for (auto it = remaining.begin(); it != remaining.end();)
        if (visited[*it])
          it = remaining.erase(it);
        else
          ++it;
    }
    for (size_t fi = 0; fi < roots.size(); ++fi) {
      if (fi) out += ".";
      emit(roots[fi], -1);
    }
    return out;
  }
};

// ---------------------------------------------------------------------------
// Morgan fingerprint (mirror of chem/fingerprint.py)
// ---------------------------------------------------------------------------

static void morgan_bits_of(const Mol& mol, int radius, int n_bits,
                           uint8_t* fp) {
  int n = (int)mol.atoms.size();
  std::memset(fp, 0, n_bits);
  std::vector<uint64_t> ids(n);
  for (int i = 0; i < n; ++i) {
    const Atom& a = mol.atoms[i];
    uint64_t vals[6] = {
        (uint64_t)mol.degree(i),          sym_code(a.symbol),
        (uint64_t)(int64_t)(a.charge + 16), (uint64_t)mol.total_h(i),
        (uint64_t)(a.in_ring ? 1 : 0),    (uint64_t)(a.aromatic ? 1 : 0),
    };
    ids[i] = fhash(vals, 6);
  }
  // env: sorted vector of bond indices per atom
  std::set<std::vector<int>> seen_envs;
  std::vector<std::vector<int>> env_bonds(n);
  for (int i = 0; i < n; ++i) fp[ids[i] % (uint64_t)n_bits] = 1;

  for (int r = 0; r < radius; ++r) {
    std::vector<uint64_t> new_ids(ids);
    std::vector<std::vector<int>> new_envs(env_bonds);
    // ECFP dedup must be atom-order independent: per-round bond-set ->
    // MINIMUM env id (mirror of chem/fingerprint.py round_envs)
    std::map<std::vector<int>, uint64_t> round_envs;
    for (int i = 0; i < n; ++i) {
      std::vector<std::pair<uint64_t, uint64_t>> neigh;  // (order_code, id)
      std::set<int> bonds_set;
      for (int bi : mol.adjacency[i]) {
        const Bond& b = mol.bonds[bi];
        int j = b.other(i);
        uint64_t order_code = b.aromatic ? 4 : (uint64_t)b.order;
        neigh.push_back({order_code, ids[j]});
        for (int e : env_bonds[j]) bonds_set.insert(e);
        bonds_set.insert(bi);
      }
      std::sort(neigh.begin(), neigh.end());
      std::vector<uint64_t> hv;
      hv.reserve(2 + neigh.size() * 2);
      hv.push_back((uint64_t)(r + 1));
      hv.push_back(ids[i]);
      for (auto& pr : neigh) {
        hv.push_back(pr.first);
        hv.push_back(pr.second);
      }
      uint64_t nid = fhash(hv.data(), hv.size());
      new_ids[i] = nid;
      std::vector<int> bonds(bonds_set.begin(), bonds_set.end());
      new_envs[i] = bonds;
      auto it = round_envs.find(bonds);
      if (it == round_envs.end() || nid < it->second) round_envs[bonds] = nid;
    }
    for (auto& kv : round_envs) {
      if (seen_envs.count(kv.first)) continue;
      seen_envs.insert(kv.first);
      fp[kv.second % (uint64_t)n_bits] = 1;
    }
    ids = std::move(new_ids);
    env_bonds = std::move(new_envs);
  }
}

// ---------------------------------------------------------------------------
// Molecular formula / weights (mirror of chem/properties.py)
// ---------------------------------------------------------------------------

static std::string formula_of(const Mol& mol) {
  std::map<std::string, int> counts;
  int charge = 0;
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    counts[mol.atoms[i].symbol]++;
    counts["H"] += mol.total_h((int)i);
    charge += mol.atoms[i].charge;
  }
  if (counts["H"] == 0) counts.erase("H");
  auto fmt = [&](const std::string& sym) {
    int c = counts[sym];
    return c > 1 ? sym + std::to_string(c) : sym;
  };
  std::string out;
  std::vector<std::string> rest;
  if (counts.count("C") && counts["C"] > 0) {
    out += fmt("C");
    if (counts.count("H") && counts["H"] > 0) out += fmt("H");
    for (auto& kv : counts)
      if (kv.first != "C" && kv.first != "H") rest.push_back(kv.first);
  } else {
    for (auto& kv : counts) rest.push_back(kv.first);
  }
  // std::map iterates in sorted order already
  for (auto& s : rest) out += fmt(s);
  if (charge) {
    std::string sign = charge > 0 ? "+" : "-";
    int mag = std::abs(charge);
    out += mag == 1 ? sign : sign + std::to_string(mag);
  }
  return out;
}

static double exact_wt_of(const Mol& mol) {
  double total = 0.0;
  double h_mono = masses().at("H").mono;
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    const Atom& a = mol.atoms[i];
    double mono = masses().at(a.symbol).mono;
    total += mono;
    if (a.isotope) total += a.isotope - llround(mono);
    total += mol.total_h((int)i) * h_mono;
  }
  return total;
}

static double avg_wt_of(const Mol& mol) {
  double total = 0.0;
  double h_avg = masses().at("H").avg;
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    total += masses().at(mol.atoms[i].symbol).avg;
    total += mol.total_h((int)i) * h_avg;
  }
  return total;
}

// ---------------------------------------------------------------------------
// Rectangular Hungarian (shortest augmenting path with potentials), exact.
// Minimizes sum cost[i, assign[i]] over distinct columns; requires n <= m.
// CPU-exact counterpart of scipy.optimize.linear_sum_assignment
// (reference: `similarity_functions_v15_4.py:735,958`).
// ---------------------------------------------------------------------------

static double hungarian(const double* cost, int n, int m, int* row_to_col) {
  const double INF = std::numeric_limits<double>::infinity();
  // potentials; 1-indexed internal arrays per the classic formulation
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int> p(m + 1, 0);    // p[j] = row matched to column j
  std::vector<int> way(m + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(m + 1, INF);
    std::vector<char> used(m + 1, false);
    do {
      used[j0] = true;
      int i0 = p[j0], j1 = -1;
      double delta = INF;
      for (int j = 1; j <= m; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * m + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= m; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  double total = 0.0;
  for (int j = 1; j <= m; ++j)
    if (p[j]) row_to_col[p[j] - 1] = j - 1;
  for (int i = 0; i < n; ++i) total += cost[i * m + row_to_col[i]];
  return total;
}

// thread helper: run fn(i) over [0, n) with nthreads workers
template <typename F>
static void parallel_for(int n, int nthreads, F fn) {
  nthreads = std::max(1, std::min(nthreads, n));
  if (nthreads == 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> workers;
  int chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([lo, hi, &fn]() {
      for (int i = lo; i < hi; ++i) fn(i);
    });
  }
  for (auto& w : workers) w.join();
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

int ck_version(void) { return 1; }

int ck_is_valid(const char* smiles) {
  try {
    parse_smiles(smiles, true);
    return 1;
  } catch (...) {
    return 0;
  }
}

// canonicalize into out (cap bytes incl NUL); returns length, or -1 invalid,
// -2 buffer too small
int ck_canonical(const char* smiles, char* out, int cap) {
  try {
    Mol mol = parse_smiles(smiles, true);
    std::vector<int> ranks = canonical_ranks(mol);
    Writer w(mol, ranks);
    std::string s = w.run();
    if ((int)s.size() + 1 > cap) return -2;
    std::memcpy(out, s.c_str(), s.size() + 1);
    return (int)s.size();
  } catch (...) {
    return -1;
  }
}

// Morgan fp: out has n_bits bytes (0/1). 0 ok, -1 invalid.
int ck_morgan_fp(const char* smiles, int radius, int n_bits,
                 unsigned char* out) {
  try {
    Mol mol = parse_smiles(smiles, true);
    morgan_bits_of(mol, radius, n_bits, out);
    return 0;
  } catch (...) {
    return -1;
  }
}

double ck_exact_mol_wt(const char* smiles) {
  try {
    return exact_wt_of(parse_smiles(smiles, true));
  } catch (...) {
    return std::nan("");
  }
}

double ck_mol_wt(const char* smiles) {
  try {
    return avg_wt_of(parse_smiles(smiles, true));
  } catch (...) {
    return std::nan("");
  }
}

int ck_formula(const char* smiles, char* out, int cap) {
  try {
    std::string s = formula_of(parse_smiles(smiles, true));
    if ((int)s.size() + 1 > cap) return -2;
    std::memcpy(out, s.c_str(), s.size() + 1);
    return (int)s.size();
  } catch (...) {
    return -1;
  }
}

// symmetry classes: out_classes must hold max_atoms ints; returns #atoms or -1
int ck_symmetry_classes(const char* smiles, int* out_classes, int max_atoms) {
  try {
    Mol mol = parse_smiles(smiles, true);
    if ((int)mol.atoms.size() > max_atoms) return -2;
    std::vector<int> cls = symmetry_classes_of(mol);
    std::copy(cls.begin(), cls.end(), out_classes);
    return (int)cls.size();
  } catch (...) {
    return -1;
  }
}

// Batch ops. smiles: array of n C strings. nthreads <= 0 -> hw concurrency.

void ck_batch_validity(const char* const* smiles, int n, unsigned char* out,
                       int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  parallel_for(n, nthreads,
               [&](int i) { out[i] = (unsigned char)ck_is_valid(smiles[i]); });
}

// out: n * cap char buffer; lengths[i] = result length or -1 invalid
void ck_batch_canonical(const char* const* smiles, int n, char* out, int cap,
                        int* lengths, int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  parallel_for(n, nthreads, [&](int i) {
    lengths[i] = ck_canonical(smiles[i], out + (size_t)i * cap, cap);
  });
}

// out: n * n_bits uint8; valid[i] 1/0
void ck_batch_morgan_fp(const char* const* smiles, int n, int radius,
                        int n_bits, unsigned char* out, unsigned char* valid,
                        int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  parallel_for(n, nthreads, [&](int i) {
    int rc = ck_morgan_fp(smiles[i], radius, n_bits,
                          out + (size_t)i * n_bits);
    valid[i] = rc == 0 ? 1 : 0;
    if (rc != 0) std::memset(out + (size_t)i * n_bits, 0, n_bits);
  });
}

// out: n * cap char buffer; lengths[i] = result length or -1 invalid
void ck_batch_formula(const char* const* smiles, int n, char* out, int cap,
                      int* lengths, int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  parallel_for(n, nthreads, [&](int i) {
    lengths[i] = ck_formula(smiles[i], out + (size_t)i * cap, cap);
  });
}

void ck_batch_exact_mol_wt(const char* const* smiles, int n, double* out,
                           int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  parallel_for(n, nthreads, [&](int i) { out[i] = ck_exact_mol_wt(smiles[i]); });
}

// Exact rectangular assignment, minimize. cost: n x m row-major, n <= m.
// out_assign: n ints (column per row). Returns total cost (inf-safe: caller
// should pass finite costs).
double ck_hungarian(const double* cost, int n, int m, int* out_assign) {
  if (n <= 0) return 0.0;
  return hungarian(cost, n, m, out_assign);
}

// Batched Hungarian over B independent problems of identical shape n x m.
void ck_batch_hungarian(const double* costs, int b, int n, int m,
                        int* out_assign, double* out_total, int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  parallel_for(b, nthreads, [&](int i) {
    out_total[i] = hungarian(costs + (size_t)i * n * m, n, m,
                             out_assign + (size_t)i * n);
  });
}

}  // extern "C"
