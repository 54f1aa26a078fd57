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
