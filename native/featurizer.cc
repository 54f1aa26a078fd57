// Native featurizer kernel: PDB CA parsing + interaction-edge construction.
//
// The reference's offline featurization stage drives graphein/biopandas
// (Python + C-backed pandas) per structure
// (reference: preprocessing/cancer_graph_construction_new_KBG.py:93-157).
// This library provides the CPU-bound inner loop as native code so the
// host-side data pipeline keeps up with TPU training throughput:
//   - parse_pdb_ca: one pass over the file extracting CA records with the
//     subgraph filter (residues 1-179 and 273-999) applied inline;
//   - build_edges: O(n^2) distance rules (peptide bond / H-bond /
//     hydrophobic / ionic) emitting both arc directions.
// Called from Python via ctypes (immunostruct_tpu/featurize/native.py);
// calls release the GIL, so a thread pool gives real parallelism across
// structures.
//
// Build: make -C native   (-> native/libfeaturizer.so)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// residue class ids: index into the 20-letter alphabetical one-hot; -1 unknown
int residue_class(const char* res3) {
  static const struct { const char* name; int cls; } kTable[] = {
      {"ALA", 0},  {"CYS", 1},  {"ASP", 2},  {"GLU", 3},  {"PHE", 4},
      {"GLY", 5},  {"HIS", 6},  {"ILE", 7},  {"LYS", 8},  {"LEU", 9},
      {"MET", 10}, {"ASN", 11}, {"PRO", 12}, {"GLN", 13}, {"ARG", 14},
      {"SER", 15}, {"THR", 16}, {"VAL", 17}, {"TRP", 18}, {"TYR", 19},
  };
  for (const auto& row : kTable) {
    if (std::strncmp(res3, row.name, 3) == 0) return row.cls;
  }
  return -1;
}

// per-class chemistry flags (same sets as featurize/edges.py)
struct ResidueFlags {
  bool hydrophobic, positive, negative, sulfur, donor, acceptor;
};

ResidueFlags flags_for_class(int cls) {
  // classes: A C D E F G H I K L M N P Q R S T V W Y (alphabetical 1-letter)
  auto in = [cls](std::initializer_list<int> set) {
    for (int s : set) if (s == cls) return true;
    return false;
  };
  ResidueFlags f{};
  // ALA VAL LEU ILE MET PHE TRP PRO TYR
  f.hydrophobic = in({0, 17, 9, 7, 10, 4, 18, 12, 19});
  // ARG LYS HIS
  f.positive = in({14, 8, 6});
  // ASP GLU
  f.negative = in({2, 3});
  // CYS MET
  f.sulfur = in({1, 10});
  // ARG ASN GLN HIS LYS SER THR TRP TYR CYS
  f.donor = in({14, 11, 13, 6, 8, 15, 16, 18, 19, 1});
  // ASP GLU ASN GLN HIS SER THR TYR MET CYS
  f.acceptor = in({2, 3, 11, 13, 6, 15, 16, 19, 10, 1});
  return f;
}

float parse_f(const char* s, int off, int len) {
  char buf[16];
  std::memcpy(buf, s + off, len);
  buf[len] = 0;
  return std::strtof(buf, nullptr);
}

}  // namespace

extern "C" {

// Parse CA records from a PDB file, keeping residues in the subgraph
// positions [1, 179] and [273, 999] (the HLA a1/a2 domains + peptide).
// Outputs (caller-allocated, capacity max_n):
//   coords[3*i..], res_class[i], resnum[i], chain_id[i], donors[i], acceptors[i]
// Returns residue count, or -1 on file error, -2 on overflow.
int parse_pdb_ca(const char* path, int apply_subgraph_filter,
                 float* coords, int* res_class, int* resnum,
                 int* chain_id, float* donors, float* acceptors, int max_n) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;

  // sidechain H-bond donor/acceptor counts per class
  static const float kDonor[20] = {0, 1, 0, 0, 0, 0, 1, 0, 1, 0,
                                   0, 1, 0, 1, 3, 1, 1, 0, 1, 1};
  static const float kAcceptor[20] = {0, 1, 2, 2, 0, 0, 1, 0, 0, 0,
                                      1, 1, 0, 1, 0, 1, 1, 0, 0, 1};

  char line[256];
  int n = 0;
  // track (chain, resnum) to keep first CA per residue
  std::unordered_set<int64_t> seen;
  while (std::fgets(line, sizeof(line), f)) {
    size_t len = std::strlen(line);
    if (len < 54) continue;
    if (std::strncmp(line, "ATOM", 4) != 0 &&
        std::strncmp(line, "HETATM", 6) != 0)
      continue;
    // atom name columns 12-15
    char atom[5];
    std::memcpy(atom, line + 12, 4);
    atom[4] = 0;
    // trim
    std::string a(atom);
    size_t b = a.find_first_not_of(' ');
    size_t e = a.find_last_not_of(' ');
    if (b == std::string::npos || a.substr(b, e - b + 1) != "CA") continue;
    char altloc = line[16];
    if (altloc != ' ' && altloc != 'A') continue;
    char chain = line[21];
    char numbuf[5];
    std::memcpy(numbuf, line + 22, 4);
    numbuf[4] = 0;
    int rn = std::atoi(numbuf);
    if (apply_subgraph_filter &&
        !((rn >= 1 && rn <= 179) || (rn >= 273 && rn <= 999)))
      continue;
    int64_t key = (static_cast<int64_t>(chain) << 32) | (uint32_t)rn;
    if (!seen.insert(key).second) continue;
    if (n >= max_n) {
      std::fclose(f);
      return -2;
    }
    coords[3 * n + 0] = parse_f(line, 30, 8);
    coords[3 * n + 1] = parse_f(line, 38, 8);
    coords[3 * n + 2] = parse_f(line, 46, 8);
    int cls = residue_class(line + 17);
    res_class[n] = cls;
    resnum[n] = rn;
    chain_id[n] = chain;
    donors[n] = (cls >= 0) ? kDonor[cls] : 0.0f;
    acceptors[n] = (cls >= 0) ? kAcceptor[cls] : 0.0f;
    ++n;
  }
  std::fclose(f);
  return n;
}

// Distance-rule edge construction (both arc directions).
// thresholds: [hbond, hbond_sulfur, hydrophobic, ionic] in Angstrom.
// Returns edge count written into src/dst (capacity max_e), or -2 on overflow.
int build_edges(const float* coords, const int* res_class, const int* resnum,
                const int* chain_id, int n, const float* thresholds,
                int* src, int* dst, int max_e) {
  const float th_hb = thresholds[0], th_hbs = thresholds[1];
  const float th_hydro = thresholds[2], th_ion = thresholds[3];
  float max_th = th_hb;
  if (th_hbs > max_th) max_th = th_hbs;
  if (th_hydro > max_th) max_th = th_hydro;
  if (th_ion > max_th) max_th = th_ion;
  const float max_th2 = max_th * max_th;

  std::vector<ResidueFlags> fl(n);
  for (int i = 0; i < n; ++i) fl[i] = flags_for_class(res_class[i]);

  int e = 0;
  auto emit = [&](int i, int j) -> bool {
    if (e + 2 > max_e) return false;
    src[e] = i; dst[e] = j; ++e;
    src[e] = j; dst[e] = i; ++e;
    return true;
  };

  for (int i = 0; i < n; ++i) {
    const float xi = coords[3 * i], yi = coords[3 * i + 1], zi = coords[3 * i + 2];
    for (int j = i + 1; j < n; ++j) {
      bool connect = false;
      // peptide bond
      if (chain_id[i] == chain_id[j]) {
        int d = resnum[i] - resnum[j];
        if (d == 1 || d == -1) connect = true;
      }
      if (!connect) {
        const float dx = xi - coords[3 * j];
        const float dy = yi - coords[3 * j + 1];
        const float dz = zi - coords[3 * j + 2];
        const float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < max_th2) {
          const float d = std::sqrt(d2);
          const ResidueFlags &a = fl[i], &b = fl[j];
          const float hb_th = (a.sulfur || b.sulfur) ? th_hbs : th_hb;
          if (((a.donor && b.acceptor) || (a.acceptor && b.donor)) && d < hb_th)
            connect = true;
          else if (a.hydrophobic && b.hydrophobic && d < th_hydro)
            connect = true;
          else if (((a.positive && b.negative) || (a.negative && b.positive)) &&
                   d < th_ion)
            connect = true;
        }
      }
      if (connect && !emit(i, j)) return -2;
    }
  }
  return e;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Atomic granularity (mirrors featurize/edges.py::build_edges_atomic):
// interaction distances measured between the actual interacting ATOMS,
// mapped to residue-level (CA) node edges. Peptide bonds stay at residue
// granularity.
// ---------------------------------------------------------------------------

namespace {

constexpr int kDonorBit = 1;
constexpr int kAcceptorBit = 2;
constexpr int kSulfurBit = 4;
constexpr int kHydroCBit = 8;
constexpr int kPosBit = 16;
constexpr int kNegBit = 32;

bool pair_in(const char* res3, const std::string& atom,
             std::initializer_list<std::pair<const char*, const char*>> set) {
  for (const auto& rn_an : set) {
    if (std::strncmp(res3, rn_an.first, 3) == 0 && atom == rn_an.second)
      return true;
  }
  return false;
}

int atom_kind(const char* res3, const std::string& atom) {
  int kind = 0;
  // backbone donor/acceptor heavy atoms
  if (atom == "N") kind |= kDonorBit;
  if (atom == "O") kind |= kAcceptorBit;
  if (pair_in(res3, atom, {{"ARG", "NE"}, {"ARG", "NH1"}, {"ARG", "NH2"},
                           {"ASN", "ND2"}, {"GLN", "NE2"}, {"HIS", "ND1"},
                           {"HIS", "NE2"}, {"LYS", "NZ"}, {"SER", "OG"},
                           {"THR", "OG1"}, {"TRP", "NE1"}, {"TYR", "OH"},
                           {"CYS", "SG"}}))
    kind |= kDonorBit;
  if (pair_in(res3, atom, {{"ASP", "OD1"}, {"ASP", "OD2"}, {"GLU", "OE1"},
                           {"GLU", "OE2"}, {"ASN", "OD1"}, {"GLN", "OE1"},
                           {"HIS", "ND1"}, {"HIS", "NE2"}, {"SER", "OG"},
                           {"THR", "OG1"}, {"TYR", "OH"}, {"MET", "SD"},
                           {"CYS", "SG"}}))
    kind |= kAcceptorBit;
  if (atom == "SD" || atom == "SG") kind |= kSulfurBit;
  // hydrophobic: R-group carbons of hydrophobic residues
  const bool backbone = (atom == "N" || atom == "CA" || atom == "C" ||
                         atom == "O" || atom == "OXT");
  const int cls = residue_class(res3);
  if (!backbone && !atom.empty() && atom[0] == 'C' &&
      flags_for_class(cls).hydrophobic)
    kind |= kHydroCBit;
  if (pair_in(res3, atom, {{"ARG", "NE"}, {"ARG", "NH1"}, {"ARG", "NH2"},
                           {"LYS", "NZ"}, {"HIS", "ND1"}, {"HIS", "NE2"}}))
    kind |= kPosBit;
  if (pair_in(res3, atom, {{"ASP", "OD1"}, {"ASP", "OD2"}, {"GLU", "OE1"},
                           {"GLU", "OE2"}}))
    kind |= kNegBit;
  return kind;
}

}  // namespace

extern "C" {

// Atomic-granularity edges: re-parses `path` for ALL atoms, classifies the
// interacting atoms, maps (chain,resnum) onto the n residue nodes given by
// resnum/chain_id (the parse_pdb_ca outputs), and emits residue-level
// edges (both directions, row-major order like np.nonzero) including
// residue-granularity peptide bonds. Returns edge count, -1 file error,
// -2 overflow.
int build_edges_atomic(const char* path, int apply_subgraph_filter,
                       const int* resnum, const int* chain_id, int n,
                       const float* thresholds, int* src, int* dst,
                       int max_e) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;

  // (chain<<32|resnum) -> node index
  std::unordered_map<int64_t, int> node_of;
  node_of.reserve(n);
  for (int i = 0; i < n; ++i) {
    node_of.emplace(
        (static_cast<int64_t>(chain_id[i]) << 32) | (uint32_t)resnum[i], i);
  }
  auto find_node = [&](char chain, int rn) -> int {
    const int64_t key = (static_cast<int64_t>(chain) << 32) | (uint32_t)rn;
    auto it = node_of.find(key);
    return it == node_of.end() ? -1 : it->second;
  };

  struct Atom {
    float x, y, z;
    int kind;
    int node;
  };
  std::vector<Atom> atoms;
  std::unordered_set<std::string> seen_atoms;

  char line[256];
  while (std::fgets(line, sizeof(line), f)) {
    size_t len = std::strlen(line);
    if (len < 54) continue;
    if (std::strncmp(line, "ATOM", 4) != 0 &&
        std::strncmp(line, "HETATM", 6) != 0)
      continue;
    char altloc = line[16];
    if (altloc != ' ' && altloc != 'A') continue;
    char atom_buf[5];
    std::memcpy(atom_buf, line + 12, 4);
    atom_buf[4] = 0;
    std::string a(atom_buf);
    size_t b = a.find_first_not_of(' ');
    size_t e = a.find_last_not_of(' ');
    if (b == std::string::npos) continue;
    a = a.substr(b, e - b + 1);
    char chain = line[21];
    char numbuf[5];
    std::memcpy(numbuf, line + 22, 4);
    numbuf[4] = 0;
    int rn = std::atoi(numbuf);
    if (apply_subgraph_filter &&
        !((rn >= 1 && rn <= 179) || (rn >= 273 && rn <= 999)))
      continue;
    std::string atom_key = std::string(1, chain) + ":" +
                           std::to_string(rn) + ":" + a;
    if (!seen_atoms.insert(atom_key).second) continue;
    int kind = atom_kind(line + 17, a);
    if (kind == 0) continue;  // atom participates in no rule
    int node = find_node(chain, rn);
    if (node < 0) continue;
    atoms.push_back({parse_f(line, 30, 8), parse_f(line, 38, 8),
                     parse_f(line, 46, 8), kind, node});
  }
  std::fclose(f);

  std::vector<uint8_t> adj(static_cast<size_t>(n) * n, 0);

  // peptide bonds at residue granularity
  for (int i = 0; i < n; ++i) {
    for (int j = i + 1; j < n; ++j) {
      if (chain_id[i] == chain_id[j]) {
        int d = resnum[i] - resnum[j];
        if (d == 1 || d == -1) {
          adj[static_cast<size_t>(i) * n + j] = 1;
          adj[static_cast<size_t>(j) * n + i] = 1;
        }
      }
    }
  }

  const float th_hb = thresholds[0], th_hbs = thresholds[1];
  const float th_hydro = thresholds[2], th_ion = thresholds[3];
  float max_th = th_hb;
  if (th_hbs > max_th) max_th = th_hbs;
  if (th_hydro > max_th) max_th = th_hydro;
  if (th_ion > max_th) max_th = th_ion;
  const float max_th2 = max_th * max_th;

  const size_t m = atoms.size();
  for (size_t i = 0; i < m; ++i) {
    const Atom& ai = atoms[i];
    for (size_t j = i + 1; j < m; ++j) {
      const Atom& aj = atoms[j];
      if (ai.node == aj.node) continue;
      const float dx = ai.x - aj.x, dy = ai.y - aj.y, dz = ai.z - aj.z;
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 >= max_th2) continue;
      const float d = std::sqrt(d2);
      bool connect = false;
      const float hb_th =
          ((ai.kind | aj.kind) & kSulfurBit) ? th_hbs : th_hb;
      if (((ai.kind & kDonorBit) && (aj.kind & kAcceptorBit)) ||
          ((ai.kind & kAcceptorBit) && (aj.kind & kDonorBit))) {
        if (d < hb_th) connect = true;
      }
      if (!connect && (ai.kind & kHydroCBit) && (aj.kind & kHydroCBit) &&
          d < th_hydro)
        connect = true;
      if (!connect &&
          (((ai.kind & kPosBit) && (aj.kind & kNegBit)) ||
           ((ai.kind & kNegBit) && (aj.kind & kPosBit))) &&
          d < th_ion)
        connect = true;
      if (connect) {
        adj[static_cast<size_t>(ai.node) * n + aj.node] = 1;
        adj[static_cast<size_t>(aj.node) * n + ai.node] = 1;
      }
    }
  }

  int e = 0;
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) {
      if (!adj[static_cast<size_t>(i) * n + j]) continue;
      if (e >= max_e) return -2;
      src[e] = i;
      dst[e] = j;
      ++e;
    }
  }
  return e;
}

}  // extern "C"
