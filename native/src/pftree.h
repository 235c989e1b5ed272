// Phyloformer-TPU native tree toolkit.
//
// C++ replacements for the reference's vendored binaries
// (/root/reference/bin/bin_linux: fastme, phylocompare, phylotree — see
// SURVEY.md §2.3): distance-matrix tree building (NJ + balanced minimum
// evolution with NNI and SPR topology search, the FastME algorithm family)
// and tree-vs-tree comparison metrics (RF, normalized RF, weighted RF,
// Kuhner-Felsenstein branch score).
//
// Algorithms: Desper & Gascuel 2002 (GME/BME, BNNI/BSPR) via Pauplin's
// balanced tree-length; Saitou & Nei 1987 / Studier & Keppler 1988 (NJ).
#pragma once

#include <array>
#include <cstdint>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace pftree {

// Unrooted tree over n leaves. Leaves are nodes [0, n); internal nodes
// follow. Edges are undirected (u, v, length); adjacency per node.
struct Tree {
  int n_leaves = 0;
  std::vector<std::string> leaf_names;          // size n_leaves
  struct Edge { int u, v; double len; };
  std::vector<Edge> edges;
  std::vector<std::vector<int>> adj;            // node -> edge ids

  int n_nodes() const { return static_cast<int>(adj.size()); }
  int other(int e, int node) const {
    return edges[e].u == node ? edges[e].v : edges[e].u;
  }
  int new_node() {
    adj.emplace_back();
    return n_nodes() - 1;
  }
  int add_edge(int u, int v, double len) {
    edges.push_back({u, v, len});
    int e = static_cast<int>(edges.size()) - 1;
    adj[u].push_back(e);
    adj[v].push_back(e);
    return e;
  }
};

// ---- newick ----
Tree parse_newick(const std::string& text);          // throws std::runtime_error
std::string to_newick(const Tree& t, int root_node = -1);

// ---- distance matrix (square PHYLIP, as written by our PHYLIP writer) ----
struct DistMatrix {
  int n = 0;
  std::vector<std::string> names;
  std::vector<double> d;  // row-major n*n
  double operator()(int i, int j) const { return d[i * n + j]; }
};
DistMatrix read_phylip(const std::string& text);

// ---- tree building ----
// method: "nj" | "bionj" | "bme" (balanced minimum evolution, taxon addition)
// nni/spr: apply balanced NNI / SPR hill-climbing after construction.
Tree build_tree(const DistMatrix& dm, const std::string& method, bool nni,
                bool spr);
// Assign balanced (BME) branch length estimates from dm to tree t.
void assign_balanced_lengths(const DistMatrix& dm, Tree* t);
// Balanced (Pauplin) tree length of a topology under dm. O(n^2).
double pauplin_length(const DistMatrix& dm, const Tree& t);

Tree nj_tree(const DistMatrix& dm);
Tree bionj_tree(const DistMatrix& dm);

// ---- comparison ----
struct CompareResult {
  double rf = 0;            // # bipartitions in exactly one tree (internal)
  double norm_rf = 0;       // rf / (2 * (n - 3))
  double weighted_rf = 0;   // sum |l1 - l2| over all bipartitions (union)
  double kf = 0;            // sqrt(sum (l1 - l2)^2), branch-score distance
  int n_common = 0;         // shared internal bipartitions
};
// include_external: count leaf branches in weighted_rf/kf too.  Default
// false — matches the reference pipeline's phylocompare kf_score column
// (internal bipartitions only; validated by reproducing the documented
// 0.333 avg KF on data/testdata, /root/reference/README.md:94-99).
CompareResult compare_trees(const Tree& a, const Tree& b,
                            bool include_external = false);

}  // namespace pftree
