// C API for ctypes bindings (phyloformer_tpu/trees/native.py).
#include <cstring>
#include <string>

#include "pftree.h"

extern "C" {

// Build a tree from a square-PHYLIP distance matrix text.
// method: "nj" or "bme"; nni/spr: 0/1 topology search toggles.
// Writes newick into out (out_len bytes). Returns 0 on success, <0 on error
// (-2: buffer too small; -1: exception, message in out if it fits).
int pftree_build(const char* phylip_text, const char* method, int nni, int spr,
                 char* out, int out_len) {
  try {
    pftree::DistMatrix dm = pftree::read_phylip(phylip_text);
    pftree::Tree t = pftree::build_tree(dm, method, nni != 0, spr != 0);
    std::string nwk = pftree::to_newick(t);
    if (static_cast<int>(nwk.size()) + 1 > out_len) return -2;
    std::memcpy(out, nwk.c_str(), nwk.size() + 1);
    return 0;
  } catch (const std::exception& e) {
    std::strncpy(out, e.what(), out_len - 1);
    out[out_len - 1] = 0;
    return -1;
  }
}

// Compare two newick trees. result must hold 5 doubles:
// [rf, norm_rf, weighted_rf, kf, n_common_bipartitions].
// include_external=0 reproduces phylocompare's kf_score (internal only).
int pftree_compare(const char* nwk1, const char* nwk2, int include_external,
                   double* result) {
  try {
    pftree::Tree a = pftree::parse_newick(nwk1);
    pftree::Tree b = pftree::parse_newick(nwk2);
    pftree::CompareResult r =
        pftree::compare_trees(a, b, include_external != 0);
    result[0] = r.rf;
    result[1] = r.norm_rf;
    result[2] = r.weighted_rf;
    result[3] = r.kf;
    result[4] = r.n_common;
    return 0;
  } catch (const std::exception&) {
    return -1;
  }
}

// Balanced (Pauplin) tree length of a newick topology under a matrix.
double pftree_pauplin_length(const char* phylip_text, const char* nwk) {
  try {
    pftree::DistMatrix dm = pftree::read_phylip(phylip_text);
    pftree::Tree t = pftree::parse_newick(nwk);
    return pftree::pauplin_length(dm, t);
  } catch (const std::exception&) {
    return -1.0;
  }
}

}  // extern "C"
