#include "pftree.h"

#include <algorithm>
#include <atomic>
#include <chrono>
#include <array>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <limits>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <thread>

namespace pftree {

// ---------------------------------------------------------------------------
// Newick
// ---------------------------------------------------------------------------

namespace {

struct PNode {
  std::string name;
  double len = std::numeric_limits<double>::quiet_NaN();
  std::vector<std::unique_ptr<PNode>> children;
};

struct Parser {
  const std::string& s;
  size_t i = 0;
  explicit Parser(const std::string& text) : s(text) {}

  void skip_ws() {
    while (i < s.size()) {
      if (std::isspace(static_cast<unsigned char>(s[i]))) {
        ++i;
      } else if (s[i] == '[') {  // comment
        size_t j = s.find(']', i + 1);
        if (j == std::string::npos) throw std::runtime_error("unterminated [comment]");
        i = j + 1;
      } else {
        break;
      }
    }
  }

  std::string label() {
    skip_ws();
    std::string out;
    if (i < s.size() && s[i] == '\'') {
      ++i;
      while (i < s.size()) {
        if (s[i] == '\'') {
          if (i + 1 < s.size() && s[i + 1] == '\'') {
            out += '\'';
            i += 2;
          } else {
            ++i;
            break;
          }
        } else {
          out += s[i++];
        }
      }
      return out;
    }
    size_t start = i;
    while (i < s.size() && std::string("(),:;[").find(s[i]) == std::string::npos) ++i;
    out = s.substr(start, i - start);
    while (!out.empty() && std::isspace(static_cast<unsigned char>(out.back()))) out.pop_back();
    return out;
  }

  std::unique_ptr<PNode> clade() {
    skip_ws();
    auto node = std::make_unique<PNode>();
    if (i < s.size() && s[i] == '(') {
      ++i;
      while (true) {
        node->children.push_back(clade());
        skip_ws();
        if (i < s.size() && s[i] == ',') {
          ++i;
          continue;
        }
        if (i < s.size() && s[i] == ')') {
          ++i;
          break;
        }
        throw std::runtime_error("newick: expected ',' or ')'");
      }
    }
    node->name = label();
    skip_ws();
    if (i < s.size() && s[i] == ':') {
      ++i;
      skip_ws();
      size_t start = i;
      while (i < s.size() &&
             (std::isdigit(static_cast<unsigned char>(s[i])) ||
              std::string("+-.eE").find(s[i]) != std::string::npos))
        ++i;
      node->len = std::stod(s.substr(start, i - start));
    }
    return node;
  }
};

void collect_leaves(const PNode* p, std::vector<const PNode*>* out) {
  if (p->children.empty()) {
    out->push_back(p);
    return;
  }
  for (const auto& c : p->children) collect_leaves(c.get(), out);
}

}  // namespace

Tree parse_newick(const std::string& text) {
  Parser parser(text);
  auto root = parser.clade();
  parser.skip_ws();
  if (parser.i < text.size() && text[parser.i] == ';') ++parser.i;

  std::vector<const PNode*> leaves;
  collect_leaves(root.get(), &leaves);

  Tree t;
  t.n_leaves = static_cast<int>(leaves.size());
  t.adj.resize(t.n_leaves);
  t.leaf_names.resize(t.n_leaves);
  std::map<const PNode*, int> leaf_id;
  for (int i = 0; i < t.n_leaves; ++i) {
    t.leaf_names[i] = leaves[i]->name;
    leaf_id[leaves[i]] = i;
  }

  // Recursively connect; returns node id representing this clade.
  std::function<int(const PNode*)> build = [&](const PNode* p) -> int {
    if (p->children.empty()) return leaf_id[p];
    int me = t.new_node();
    for (const auto& c : p->children) {
      int cid = build(c.get());
      double len = std::isnan(c->len) ? 0.0 : c->len;
      t.add_edge(me, cid, len);
    }
    return me;
  };
  int root_id = build(root.get());

  // Suppress a degree-2 root (rooted newick of an unrooted tree).
  if (t.adj[root_id].size() == 2) {
    int e0 = t.adj[root_id][0], e1 = t.adj[root_id][1];
    int a = t.other(e0, root_id), b = t.other(e1, root_id);
    double len = t.edges[e0].len + t.edges[e1].len;
    // rewire e0 to connect a-b, drop e1
    t.edges[e0] = {a, b, len};
    t.adj[a].clear();
    t.adj[b].clear();
    t.adj[root_id].clear();
    // rebuild adjacency (simplest correct approach)
    std::vector<Tree::Edge> kept;
    for (int e = 0; e < static_cast<int>(t.edges.size()); ++e) {
      if (e == e1) continue;
      kept.push_back(t.edges[e]);
    }
    t.edges = kept;
    for (auto& adj : t.adj) adj.clear();
    for (int e = 0; e < static_cast<int>(t.edges.size()); ++e) {
      t.adj[t.edges[e].u].push_back(e);
      t.adj[t.edges[e].v].push_back(e);
    }
  }
  return t;
}

std::string to_newick(const Tree& t, int root_node) {
  if (t.n_leaves == 1) return t.leaf_names[0] + ";";
  if (root_node < 0) {
    // root at an internal node if any; else at leaf 0's neighbor
    root_node = t.n_leaves < t.n_nodes() ? t.n_leaves : 0;
  }
  std::ostringstream os;
  os.precision(12);
  std::function<void(int, int)> rec = [&](int node, int from_edge) {
    std::vector<std::pair<int, int>> kids;  // (edge, child)
    for (int e : t.adj[node]) {
      if (e == from_edge) continue;
      kids.emplace_back(e, t.other(e, node));
    }
    if (kids.empty()) {
      os << t.leaf_names[node];
      return;
    }
    os << '(';
    for (size_t k = 0; k < kids.size(); ++k) {
      if (k) os << ',';
      rec(kids[k].second, kids[k].first);
      os << ':' << t.edges[kids[k].first].len;
    }
    os << ')';
    if (node < t.n_leaves) os << t.leaf_names[node];
  };
  rec(root_node, -1);
  os << ';';
  return os.str();
}

// ---------------------------------------------------------------------------
// PHYLIP
// ---------------------------------------------------------------------------

DistMatrix read_phylip(const std::string& text) {
  std::istringstream is(text);
  DistMatrix dm;
  is >> dm.n;
  if (dm.n < 2) throw std::runtime_error("phylip: need >= 2 taxa");
  dm.names.resize(dm.n);
  dm.d.resize(static_cast<size_t>(dm.n) * dm.n);
  for (int i = 0; i < dm.n; ++i) {
    if (!(is >> dm.names[i])) throw std::runtime_error("phylip: truncated");
    for (int j = 0; j < dm.n; ++j) {
      if (!(is >> dm.d[i * dm.n + j])) throw std::runtime_error("phylip: truncated row");
    }
  }
  return dm;
}

// ---------------------------------------------------------------------------
// Balanced (BME) machinery
// ---------------------------------------------------------------------------
//
// For every *directed* edge d = (tail -> head) define subtree(d) as the
// component containing head after removing the edge.  For leaves x in that
// subtree, w_d(x) = 2^-(edge count from head to x).  Then the balanced
// average distance between two disjoint subtrees A, B is
// delta(A,B) = sum_{a,b} w_A(a) w_B(b) D(a,b), and Pauplin's balanced tree
// length assigns each leaf pair weight 2^(1-p_ij).
//
// The workhorse arrays (computed by BalancedTables):
//   w[d][t]  : weight of leaf t in subtree(d) (0 if absent)
//   dv[d][t] : sum_x w_d(x) D(x, t)  for every leaf t (even outside)
// giving delta(sub(d1), sub(d2)) = sum_t w[d2][t] * dv[d1][t].

namespace {

struct Directed {
  int edge;  // undirected edge id
  int head;  // subtree side
  int tail;
};

struct BalancedTables {
  int n;                               // leaves in the tree
  std::vector<Directed> dir;           // 2 per edge: 2e (u->v), 2e+1 (v->u)
  std::vector<std::vector<double>> w;  // [2E][n]
  std::vector<std::vector<double>> dv; // [2E][n]

  static int fwd(int e) { return 2 * e; }
  static int rev(int e) { return 2 * e + 1; }

  void compute(const Tree& t, const DistMatrix& dm,
               const std::vector<int>& leaf_to_dm) {
    n = dm.n;
    int ne = static_cast<int>(t.edges.size());
    dir.assign(2 * ne, {});
    for (int e = 0; e < ne; ++e) {
      dir[2 * e] = {e, t.edges[e].v, t.edges[e].u};
      dir[2 * e + 1] = {e, t.edges[e].u, t.edges[e].v};
    }
    w.assign(2 * ne, std::vector<double>(n, 0.0));
    dv.assign(2 * ne, std::vector<double>(n, 0.0));

    // topological order: process subtree(d) after its children.
    std::vector<int> order;
    order.reserve(2 * ne);
    std::vector<char> done(2 * ne, 0);
    std::function<void(int)> visit = [&](int d) {
      if (done[d]) return;
      done[d] = 2;  // in progress marker unnecessary in a tree
      int head = dir[d].head;
      for (int e2 : t.adj[head]) {
        if (e2 == dir[d].edge) continue;
        int child = t.edges[e2].v == head ? 2 * e2 : 2 * e2 + 1;
        // child points away from head
        int cd = (dir[2 * e2].tail == head) ? 2 * e2 : 2 * e2 + 1;
        visit(cd);
        (void)child;
      }
      order.push_back(d);
    };
    for (int d = 0; d < 2 * ne; ++d) visit(d);

    for (int d : order) {
      int head = dir[d].head;
      if (head < t.n_leaves) {
        int li = leaf_to_dm[head];
        w[d][li] = 1.0;
        for (int tt = 0; tt < n; ++tt) dv[d][tt] = dm(li, tt);
        continue;
      }
      // average of children (balanced): 1/2 sum over child subtrees
      int count = 0;
      for (int e2 : t.adj[head]) {
        if (e2 == dir[d].edge) continue;
        int cd = (dir[2 * e2].tail == head) ? 2 * e2 : 2 * e2 + 1;
        ++count;
        for (int tt = 0; tt < n; ++tt) {
          w[d][tt] += w[cd][tt];
          dv[d][tt] += dv[cd][tt];
        }
      }
      double f = count > 0 ? 1.0 / count : 0.0;  // binary: 1/2
      for (int tt = 0; tt < n; ++tt) {
        w[d][tt] *= f;
        dv[d][tt] *= f;
      }
    }
  }

  // delta(sub(d1), sub(d2)) — subtrees must be disjoint.
  double delta(int d1, int d2) const {
    double s = 0;
    for (int tt = 0; tt < n; ++tt) s += w[d2][tt] * dv[d1][tt];
    return s;
  }

  // delta of the two sides of undirected edge e.
  double delta_split(int e) const { return delta(fwd(e), rev(e)); }

  // delta(S, sub(d)) for an external leaf-weighted set S given its
  // distance profile ds[t] = sum_s wS(s) D(s, t).
  double delta_set(const std::vector<double>& ds, int d) const {
    double s = 0;
    for (int tt = 0; tt < n; ++tt) s += w[d][tt] * ds[tt];
    return s;
  }
};

// directed edge at `node` pointing away from it along undirected edge e.
int away(const Tree& t, int e, int node) {
  return t.edges[e].u == node ? 2 * e : 2 * e + 1;
}

// ---------------------------------------------------------------------------
// Persistent memoized pair-delta cache (Desper & Gascuel 2002 machinery)
// ---------------------------------------------------------------------------
//
// delta(sub(d1), sub(d2)) for *disjoint* directed subtrees, computed lazily
// by the halving recursion delta(a,b) = 1/2(delta(kid0(a),b)+delta(kid1(a),b))
// and cached in a fixed-stride table that SURVIVES topology changes: every
// directed edge carries a version counter, each cached entry stores the two
// versions it was computed under, and a mutation only bumps the versions of
// the directions whose subtree actually changed (those containing a modified
// vertex).  Shared by greedy BME insertion, BNNI and BSPR, this replaces the
// full O(n^2) table recomputation the previous code paid per applied move —
// per-move upkeep drops to O(n) invalidation + on-demand refills that only
// walk the changed region (O(n·diam) amortized, the D&G bound).
class DeltaCache {
 public:
  // One-time allocation for a tree that will grow to n_leaves leaves.
  // Returns false (cache unusable) if the final table would exceed ~1 GiB.
  bool alloc(int n_leaves, const DistMatrix& dm, const std::vector<int>& map) {
    dm_ = &dm;
    map_ = &map;
    int ne_final = n_leaves <= 2 ? 1 : 2 * n_leaves - 3;
    mcap_ = 2 * ne_final;
    if (static_cast<size_t>(mcap_) * mcap_ > (size_t{1} << 26)) return false;
    // value-init zeroes every stamp; stamp 0 never matches a real version
    cell_.reset(new Cell[static_cast<size_t>(mcap_) * mcap_]());
    ver_.assign(mcap_, 1);
    usable_ = true;
    return true;
  }
  bool usable() const { return usable_; }

  // Refresh the structural arrays after any topology change.  Cached values
  // stay; validity is decided per-entry by the version stamps.  Marks the
  // cache unusable on non-binary trees (multifurcation / degree-2 internal).
  bool rebuild(const Tree& t) {
    if (!usable_) return false;
    int ne = static_cast<int>(t.edges.size());
    m_ = 2 * ne;
    if (m_ > mcap_) {
      usable_ = false;
      return false;
    }
    head_.assign(m_, -1);
    kids_.assign(m_, {-1, -1});
    sz_.assign(m_, 0);
    for (int d = 0; d < m_; ++d) {
      int e = d / 2;
      head_[d] = d % 2 == 0 ? t.edges[e].v : t.edges[e].u;
      if (head_[d] >= t.n_leaves) {
        int k = 0;
        for (int e2 : t.adj[head_[d]]) {
          if (e2 == e) continue;
          if (k == 2) {
            usable_ = false;
            return false;
          }
          kids_[d][k++] = away(t, e2, head_[d]);
        }
        if (k != 2) {
          usable_ = false;
          return false;
        }
      }
    }
    order_.clear();
    order_.reserve(m_);
    // Iterative postorder over the directed-edge DAG (a direction can be
    // reached from two parents, so the emitted flag is per node while the
    // expanded bit is per stack FRAME — emitting on a node-level state
    // would mis-order shared children).  rebuild runs once per applied
    // move and once per construction insert; the call overhead of the
    // previous recursive std::function was a measurable constant at
    // n >= 800.
    done_.assign(m_, 0);
    stack_.clear();
    for (int d0 = 0; d0 < m_; ++d0) {
      if (done_[d0]) continue;
      stack_.push_back(d0 << 1);
      while (!stack_.empty()) {
        int frame = stack_.back();
        int d = frame >> 1;
        if (done_[d]) {  // emitted via an earlier frame
          stack_.pop_back();
          continue;
        }
        if (frame & 1) {  // children complete; emit
          stack_.pop_back();
          done_[d] = 1;
          order_.push_back(d);
          continue;
        }
        stack_.back() = frame | 1;  // mark this frame expanded
        if (kids_[d][0] >= 0) {
          if (!done_[kids_[d][1]]) stack_.push_back(kids_[d][1] << 1);
          if (!done_[kids_[d][0]]) stack_.push_back(kids_[d][0] << 1);
        }
      }
    }
    for (int d : order_)
      sz_[d] = kids_[d][0] < 0 ? 1 : sz_[kids_[d][0]] + sz_[kids_[d][1]];
    return true;
  }

  // Bump the version of every direction whose subtree contains one of
  // `verts` (postorder pass over the CURRENT tree; call after rebuild()).
  void invalidate_containing(std::initializer_list<int> verts) {
    std::vector<char> cont(m_, 0);
    for (int d : order_) {
      char c = 0;
      for (int v2 : verts)
        if (head_[d] == v2) c = 1;
      if (kids_[d][0] >= 0)
        c = c | cont[kids_[d][0]] | cont[kids_[d][1]];
      cont[d] = c;
      if (c) ++ver_[d];
    }
  }

  // rebuild + drop every cached entry (used after slow-path mutations that
  // bypass the incremental bookkeeping).
  bool resync_all(const Tree& t) {
    if (!rebuild(t)) return false;
    for (int d = 0; d < m_; ++d) ++ver_[d];
    return true;
  }

  // Precondition: sub(d1) and sub(d2) are disjoint.  Thread-safe for
  // concurrent readers during the scan phases: a fill publishes the value
  // with a release store of the stamp, readers pair it with an acquire
  // load, and concurrent fills of the same entry write identical bits (the
  // value is a deterministic function of dm and the stamped versions).
  // Version bumps / rebuilds must stay single-threaded.
  double at(int d1, int d2) {
    size_t idx = static_cast<size_t>(d1) * mcap_ + d2;
    uint64_t want =
        (static_cast<uint64_t>(ver_[d1]) << 32) | ver_[d2];
    Cell& c = cell_[idx];
    if (c.stamp.load(std::memory_order_acquire) == want)
      return c.val.load(std::memory_order_relaxed);
    int a = d1, b = d2;
    if (sz_[a] < sz_[b]) std::swap(a, b);
    double r = sz_[a] == 1
                   ? (*dm_)((*map_)[head_[a]], (*map_)[head_[b]])
                   : 0.5 * (at(kids_[a][0], b) + at(kids_[a][1], b));
    c.val.store(r, std::memory_order_relaxed);
    c.stamp.store(want, std::memory_order_release);
    Cell& c2 = cell_[static_cast<size_t>(d2) * mcap_ + d1];
    c2.val.store(r, std::memory_order_relaxed);
    c2.stamp.store((static_cast<uint64_t>(ver_[d2]) << 32) | ver_[d1],
                   std::memory_order_release);
    return r;
  }

  // --- sweep-to-sweep dirt tracking (batched SPR scan pruning) ------------
  //
  // snapshot_versions() records the per-direction versions a completed SPR
  // scan read its deltas under; refresh_dirty() (call at the START of the
  // next scan, after any rebuilds) recomputes, in postorder, which
  // directions' subtrees changed since that snapshot.  A (prune, target)
  // pair whose every contributing direction is clean has the exact same
  // insertion cost as last scan — and the batched sweep either applied or
  // version-invalidated every improving move it recorded, so clean costs
  // are known non-improving and whole clean cones can be skipped.
  void snapshot_versions() {
    last_ver_ = ver_;
    has_snap_ = true;
  }
  void refresh_dirty() {
    dirty_.assign(m_, 1);
    dirty_sub_.assign(m_, 1);
    if (!has_snap_) return;  // no snapshot yet: everything dirty (full scan)
    for (int d : order_) {
      char self = d >= static_cast<int>(last_ver_.size()) ||
                  ver_[d] != last_ver_[d];
      dirty_[d] = self;
      char sub = self;
      if (kids_[d][0] >= 0)
        sub = sub | dirty_sub_[kids_[d][0]] | dirty_sub_[kids_[d][1]];
      dirty_sub_[d] = sub;
    }
  }
  bool dirty(int d) const { return dirty_[d]; }
  bool dirty_sub(int d) const { return dirty_sub_[d]; }

  // Hint the cache line of entry (d1, d2) into L1 ahead of at() — the scan
  // is bound by dependent random accesses into the (hundreds of MB) table;
  // issuing the loads for a whole mixture up front overlaps the misses.
  void prefetch(int d1, int d2) const {
    __builtin_prefetch(&cell_[static_cast<size_t>(d1) * mcap_ + d2], 0, 1);
  }

  // Balanced average distance from dm row k_dm to every directed subtree,
  // in O(edges) (postorder halving; the D&G per-insertion recursion).
  void new_taxon_averages(int k_dm, std::vector<double>* down) const {
    down->resize(m_);
    for (int d : order_) {
      (*down)[d] = kids_[d][0] < 0
                       ? (*dm_)(k_dm, (*map_)[head_[d]])
                       : 0.5 * ((*down)[kids_[d][0]] + (*down)[kids_[d][1]]);
    }
  }

  // Postorder halving of an arbitrary per-leaf-vertex base vector:
  // out[d] = base[leaf vertex] at leaf directions, else the kids' mean.
  // Used by the incremental BME construction to turn delta(S, {leaf})
  // profiles into delta(S, sub(d)) for every direction in O(edges).
  void mix_from_leafbase(const std::vector<double>& base,
                         std::vector<double>* out) const {
    out->resize(m_);
    for (int d : order_) {
      (*out)[d] = kids_[d][0] < 0
                      ? base[head_[d]]
                      : 0.5 * ((*out)[kids_[d][0]] + (*out)[kids_[d][1]]);
    }
  }

  // Leaves of sub(d) with their balanced weights (2^{1-depth}; weights sum
  // to 1): the leaf-mixture that defines delta(sub(d), .).  O(|sub(d)|).
  void leaf_weights(int d, std::vector<std::pair<int, double>>* out) const {
    out->clear();
    std::vector<std::pair<int, double>> st{{d, 1.0}};
    while (!st.empty()) {
      auto [dd, wgt] = st.back();
      st.pop_back();
      if (kids_[dd][0] < 0) {
        out->emplace_back(head_[dd], wgt);
      } else {
        st.emplace_back(kids_[dd][0], wgt * 0.5);
        st.emplace_back(kids_[dd][1], wgt * 0.5);
      }
    }
  }

  // Store an externally-computed delta(sub(d1), sub(d2)) under the current
  // version stamps (used to seed the table with the construction's
  // incrementally-maintained sibling deltas so the NNI scan starts warm).
  // Single-threaded use only, like version bumps.
  void put(int d1, int d2, double val) {
    Cell& c = cell_[static_cast<size_t>(d1) * mcap_ + d2];
    c.val.store(val, std::memory_order_relaxed);
    c.stamp.store((static_cast<uint64_t>(ver_[d1]) << 32) | ver_[d2],
                  std::memory_order_release);
    Cell& c2 = cell_[static_cast<size_t>(d2) * mcap_ + d1];
    c2.val.store(val, std::memory_order_relaxed);
    c2.stamp.store((static_cast<uint64_t>(ver_[d2]) << 32) | ver_[d1],
                   std::memory_order_release);
  }

  int sz(int d) const { return sz_[d]; }
  int head(int d) const { return head_[d]; }

 private:
  // value + the (ver_[d1], ver_[d2]) pair it was computed under, interleaved
  // so a warm probe touches one cache line instead of two (the table is
  // hundreds of MB at n>=800; the scan's random accesses are miss-bound).
  // Atomics make concurrent scan-phase fills well-defined (see at()); on
  // x86-64 the relaxed/acquire/release ops compile to plain loads/stores.
  struct Cell {
    std::atomic<double> val;
    std::atomic<uint64_t> stamp;
  };
  const DistMatrix* dm_ = nullptr;
  const std::vector<int>* map_ = nullptr;
  int mcap_ = 0, m_ = 0;
  bool usable_ = false, has_snap_ = false;
  std::vector<int> head_, sz_, order_, stack_;
  std::vector<char> done_;
  std::vector<std::array<int, 2>> kids_;
  std::vector<uint32_t> ver_, last_ver_;
  std::vector<char> dirty_, dirty_sub_;
  std::unique_ptr<Cell[]> cell_;
};

}  // namespace

double pauplin_length(const DistMatrix& dm, const Tree& t) {
  // p_ij via BFS from every leaf (edge counts).
  int n = t.n_leaves;
  std::vector<int> leaf_to_dm(t.n_leaves);
  for (int i = 0; i < t.n_leaves; ++i) {
    auto it = std::find(dm.names.begin(), dm.names.end(), t.leaf_names[i]);
    if (it == dm.names.end()) throw std::runtime_error("taxon missing in matrix");
    leaf_to_dm[i] = static_cast<int>(it - dm.names.begin());
  }
  double total = 0;
  std::vector<int> depth(t.n_nodes());
  for (int i = 0; i < n; ++i) {
    std::fill(depth.begin(), depth.end(), -1);
    std::vector<int> stack{i};
    depth[i] = 0;
    while (!stack.empty()) {
      int u = stack.back();
      stack.pop_back();
      for (int e : t.adj[u]) {
        int v = t.other(e, u);
        if (depth[v] < 0) {
          depth[v] = depth[u] + 1;
          stack.push_back(v);
        }
      }
    }
    for (int j = i + 1; j < n; ++j)
      total += std::ldexp(dm(leaf_to_dm[i], leaf_to_dm[j]), 1 - depth[j]);
  }
  return total;
}

// ---------------------------------------------------------------------------
// NJ
// ---------------------------------------------------------------------------

// Shared scaffold for NJ (Saitou-Nei) and BioNJ (Gascuel 1997).  BioNJ
// tracks pair variances and mixes the reduction d(u,k) with the
// variance-minimizing lambda instead of NJ's fixed 1/2.
static Tree nj_family_tree(const DistMatrix& dm, bool bionj) {
  int n = dm.n;
  Tree t;
  t.n_leaves = n;
  t.leaf_names = dm.names;
  t.adj.resize(n);
  if (n == 2) {
    int r = t.new_node();  // degree-2 helper; will print fine
    t.add_edge(r, 0, dm(0, 1) / 2);
    t.add_edge(r, 1, dm(0, 1) / 2);
    return t;
  }

  std::vector<double> d(dm.d);
  std::vector<double> var(dm.d);  // BioNJ pair variances (init = distances)
  std::vector<int> node_of(n);
  std::vector<int> active(n);
  for (int i = 0; i < n; ++i) node_of[i] = i, active[i] = i;

  auto D = [&](int i, int j) -> double& { return d[i * n + j]; };
  auto V = [&](int i, int j) -> double& { return var[i * n + j]; };

  std::vector<int> act(active);
  while (static_cast<int>(act.size()) > 3) {
    int m = static_cast<int>(act.size());
    std::vector<double> tot(m, 0.0);
    for (int a = 0; a < m; ++a)
      for (int b = 0; b < m; ++b) tot[a] += D(act[a], act[b]);
    double best = std::numeric_limits<double>::infinity();
    int bi = 0, bj = 1;
    for (int a = 0; a < m; ++a)
      for (int b = a + 1; b < m; ++b) {
        double q = (m - 2) * D(act[a], act[b]) - tot[a] - tot[b];
        if (q < best) best = q, bi = a, bj = b;
      }
    int ia = act[bi], ib = act[bj];
    double dij = D(ia, ib);
    double la = 0.5 * dij + (tot[bi] - tot[bj]) / (2.0 * (m - 2));
    double lb = dij - la;
    la = std::max(la, 0.0);
    lb = std::max(lb, 0.0);
    int parent = t.new_node();
    t.add_edge(parent, node_of[ia], la);
    t.add_edge(parent, node_of[ib], lb);
    double lambda = 0.5;
    if (bionj && V(ia, ib) > 1e-12 && m > 2) {
      double s = 0;
      for (int c = 0; c < m; ++c) {
        int k = act[c];
        if (k == ia || k == ib) continue;
        s += V(ib, k) - V(ia, k);
      }
      lambda = 0.5 + s / (2.0 * (m - 2) * V(ia, ib));
      lambda = std::min(1.0, std::max(0.0, lambda));
    }
    for (int c = 0; c < m; ++c) {
      int k = act[c];
      if (k == ia || k == ib) continue;
      double duk = lambda * (D(ia, k) - la) + (1.0 - lambda) * (D(ib, k) - lb);
      double vuk = lambda * V(ia, k) + (1.0 - lambda) * V(ib, k) -
                   lambda * (1.0 - lambda) * V(ia, ib);
      D(ia, k) = D(k, ia) = duk;
      V(ia, k) = V(k, ia) = vuk;
    }
    node_of[ia] = parent;
    act.erase(act.begin() + bj);
  }
  // join last three at a center node
  int center = t.new_node();
  int x = act[0], y = act[1], z = act[2];
  double lx = 0.5 * (D(x, y) + D(x, z) - D(y, z));
  double ly = 0.5 * (D(x, y) + D(y, z) - D(x, z));
  double lz = 0.5 * (D(x, z) + D(y, z) - D(x, y));
  t.add_edge(center, node_of[x], std::max(lx, 0.0));
  t.add_edge(center, node_of[y], std::max(ly, 0.0));
  t.add_edge(center, node_of[z], std::max(lz, 0.0));
  return t;
}

Tree nj_tree(const DistMatrix& dm) { return nj_family_tree(dm, false); }
Tree bionj_tree(const DistMatrix& dm) { return nj_family_tree(dm, true); }

// ---------------------------------------------------------------------------
// BME construction + BNNI + BSPR
// ---------------------------------------------------------------------------

namespace {

std::vector<int> identity_map(const Tree& t, const DistMatrix& dm) {
  std::map<std::string, int> name_to_dm;
  for (int j = 0; j < dm.n; ++j) name_to_dm[dm.names[j]] = j;
  std::vector<int> map(t.n_leaves);
  for (int i = 0; i < t.n_leaves; ++i) {
    auto it = name_to_dm.find(t.leaf_names[i]);
    if (it == name_to_dm.end()) throw std::runtime_error("taxon missing in matrix");
    map[i] = it->second;
  }
  return map;
}

// Greedy balanced taxon addition, reference version: full balanced tables
// recomputed per insertion, O(n^3) total.  Kept as the fallback for trees
// beyond the DeltaCache memory cap and as the PFTREE_SLOW_BME regression
// reference for bme_greedy_fast below.
Tree bme_greedy_slow(const DistMatrix& dm) {
  int n = dm.n;
  Tree t;
  t.n_leaves = n;
  t.leaf_names = dm.names;
  t.adj.resize(n);
  if (n == 2) {
    int r = t.new_node();
    t.add_edge(r, 0, 0);
    t.add_edge(r, 1, 0);
    return t;
  }
  int c = t.new_node();
  t.add_edge(c, 0, 0);
  t.add_edge(c, 1, 0);
  t.add_edge(c, 2, 0);

  std::vector<int> map = identity_map(t, dm);
  BalancedTables bt;
  for (int k = 3; k < n; ++k) {
    bt.compute(t, dm, map);
    // dk[t] = D(k, t)
    std::vector<double> dk(n);
    for (int tt = 0; tt < n; ++tt) dk[tt] = dm(k, tt);
    double best = std::numeric_limits<double>::infinity();
    int best_e = -1;
    for (int e = 0; e < static_cast<int>(t.edges.size()); ++e) {
      double f = 0.5 * (bt.delta_set(dk, BalancedTables::fwd(e)) +
                        bt.delta_set(dk, BalancedTables::rev(e)) -
                        bt.delta_split(e));
      if (f < best) best = f, best_e = e;
    }
    // split best_e, attach leaf k
    int u = t.edges[best_e].u, v = t.edges[best_e].v;
    double half = t.edges[best_e].len / 2;
    int m = t.new_node();
    t.edges[best_e] = {u, m, half};
    // fix adjacency of v: replace best_e with new edge m-v
    auto& av = t.adj[v];
    av.erase(std::find(av.begin(), av.end(), best_e));
    t.adj[m].push_back(best_e);
    t.add_edge(m, v, half);
    t.add_edge(m, k, 0.0);
  }
  return t;
}

// Greedy balanced taxon addition in O(n^2 · diam) (Desper & Gascuel 2002):
// per inserted taxon k, (a) the balanced averages Delta(k, sub(d)) for every
// directed subtree come from one O(n) postorder halving pass, and (b) the
// insertion cost of every edge follows from a single tree traversal using
// the O(1) crossing recursion
//   c(y) - c(x) = 1/4 [ Delta(k,Y) - Delta(k,X) + delta(X,Z) - delta(Y,Z) ]
// at a node with edges x,y,z and subtrees-beyond X,Y,Z — only cost
// DIFFERENCES are needed to pick the argmin edge, so no split-delta is ever
// evaluated absolutely.  The sibling deltas come from the persistent
// DeltaCache, which after each insertion only invalidates directions whose
// subtree contains the new junction.
Tree bme_greedy_fast(const DistMatrix& dm, DeltaCache* cache) {
  int n = dm.n;
  Tree t;
  t.n_leaves = n;
  t.leaf_names = dm.names;
  t.adj.resize(n);
  int c = t.new_node();
  t.add_edge(c, 0, 0);
  t.add_edge(c, 1, 0);
  t.add_edge(c, 2, 0);
  cache->rebuild(t);

  std::vector<int> map = identity_map(t, dm);
  // Incrementally-maintained sibling deltas: sib[v][i] = delta of the two
  // subtrees hanging off internal vertex v beyond adj[v][j], j != i (the
  // "omitted-edge" slot convention).  These are the only pair deltas the
  // D&G insertion-cost recursion consumes, so maintaining them directly
  // (O(1) per changed value via the 2^{-l} leaf-insertion update formula)
  // removes every big-table lookup from the hot walk — the previous
  // version refilled them lazily through the DeltaCache, which at n=2000
  // was ~5 s of dependent random misses into a ~1 GiB table.
  std::vector<std::array<double, 3>> sib(2 * n);
  sib[c] = {dm(map[1], map[2]), dm(map[0], map[2]), dm(map[0], map[1])};

  std::vector<double> down, rowtmp, smallbase, bigbase, smallvals, bigvals;
  std::vector<double> rel;
  std::vector<int> stack;
  std::vector<std::pair<int, double>> leafw;
  std::vector<std::array<int, 4>> bfs;  // (vertex, via-edge, t', far-flag)
  for (int k = 3; k < n; ++k) {
    cache->new_taxon_averages(map[k], &down);
    int ne = static_cast<int>(t.edges.size());
    rel.assign(ne, std::numeric_limits<double>::quiet_NaN());
    rel[0] = 0.0;
    stack.assign(1, 0);
    while (!stack.empty()) {
      int x = stack.back();
      stack.pop_back();
      for (int side = 0; side < 2; ++side) {
        int vtx = side == 0 ? t.edges[x].u : t.edges[x].v;
        if (vtx < t.n_leaves) continue;
        int y = -1, z = -1, px = -1, py = -1, pz = -1;
        for (int i = 0; i < 3; ++i) {
          int e2 = t.adj[vtx][i];
          if (e2 == x) px = i;
          else if (y < 0) y = e2, py = i;
          else z = e2, pz = i;
        }
        int Xd = away(t, x, vtx);
        for (int rep = 0; rep < 2; ++rep) {
          int yy = rep == 0 ? y : z;
          if (!std::isnan(rel[yy])) continue;
          int Yd = away(t, yy, vtx);
          double d_xz = sib[vtx][rep == 0 ? py : pz];  // delta(X, Z)
          double d_yz = sib[vtx][px];                  // delta(Y, Z)
          rel[yy] = rel[x] + 0.25 * (down[Yd] - down[Xd] + d_xz - d_yz);
          stack.push_back(yy);
        }
      }
    }
    // argmin; ties resolve to the lowest edge id like the slow version
    double best = std::numeric_limits<double>::infinity();
    int best_e = -1;
    for (int e = 0; e < ne; ++e)
      if (rel[e] < best) best = rel[e], best_e = e;

    // --- per-insert averages around the split edge (old tree) -----------
    int u = t.edges[best_e].u, v = t.edges[best_e].v;
    int d_to_v = away(t, best_e, u);  // subtree beyond v
    int d_to_u = away(t, best_e, v);  // subtree beyond u
    bool v_small = cache->sz(d_to_v) <= cache->sz(d_to_u);
    int d_small = v_small ? d_to_v : d_to_u;
    int d_big = v_small ? d_to_u : d_to_v;
    cache->leaf_weights(d_small, &leafw);
    // delta(smallside, {leaf i}) for every tree leaf: O(|small| * n) axpy
    smallbase.assign(n, 0.0);
    for (auto [lv, wgt] : leafw) {
      const double* row = &dm.d[static_cast<size_t>(map[lv]) * dm.n];
      for (int iv = 0; iv < n; ++iv) smallbase[iv] += wgt * row[map[iv]];
    }
    // smallvals[d] = delta(smallside, sub(d)), valid for d in the big side
    cache->mix_from_leafbase(smallbase, &smallvals);
    // delta(bigside, {leaf i}) for i in the small side (O(|small|) halving
    // passes), then bigvals[d] = delta(bigside, sub(d)) for d in the small
    bigbase.assign(n, 0.0);
    for (auto [lv, wgt] : leafw) {
      cache->new_taxon_averages(map[lv], &rowtmp);
      bigbase[lv] = rowtmp[d_big];
    }
    cache->mix_from_leafbase(bigbase, &bigvals);
    double split = 0.0;  // delta(two sides of best_e)
    for (auto [lv, wgt] : leafw) split += wgt * bigbase[lv];
    double down_v = down[d_to_v], down_u = down[d_to_u];

    // --- splice best_e, attach leaf k (same surgery as bme_greedy_slow),
    // mirroring v's adjacency reorder onto its sibling-delta slots --------
    double half = t.edges[best_e].len / 2;
    int m = t.new_node();
    if (static_cast<size_t>(m) >= sib.size()) sib.resize(m + 1);
    t.edges[best_e] = {u, m, half};
    auto& av = t.adj[v];
    if (v >= t.n_leaves) {
      int pos = static_cast<int>(
          std::find(av.begin(), av.end(), best_e) - av.begin());
      double keep = sib[v][pos];
      sib[v][pos] = sib[v][2];
      sib[v][2] = keep;  // value follows its omitted edge to the back slot
      std::swap(av[pos], av[2]);
      av.pop_back();
      t.adj[m].push_back(best_e);
      t.add_edge(m, v, half);  // lands in av[2]: slot value stays aligned
    } else {
      av.erase(std::find(av.begin(), av.end(), best_e));
      t.adj[m].push_back(best_e);
      t.add_edge(m, v, half);
    }
    t.add_edge(m, k, 0.0);
    // new junction's own sibling deltas: adj[m] = [best_e(u), e_v, e_k]
    sib[m] = {down_v, down_u, split};

    // --- O(1) updates of every sibling delta whose pair gained leaf k ---
    // For internal vertex w at junction distance t' from m (t'(u)=t'(v)=1),
    // the two slots pairing w's toward-m subtree A with a pendant B become
    //   delta(A+{k}, B) = delta(A, B) + 2^{-t'} (delta(k,B) - delta(F,B))
    // where F is the far half of the split edge as seen from w.  delta(k,B)
    // is this insert's down[]; delta(F,B) is smallvals/bigvals above.
    // entries: (vertex, via-edge toward m, t', far-is-smallvals flag).
    // A viewer's far half is the OPPOSITE side of the split edge, and the
    // flag is inherited unchanged as the BFS walks outward on one side.
    bfs.clear();
    if (u >= t.n_leaves) bfs.push_back({u, best_e, 1, v_small ? 1 : 0});
    if (v >= t.n_leaves) bfs.push_back({v, t.adj[v][2], 1, v_small ? 0 : 1});
    for (size_t qi = 0; qi < bfs.size(); ++qi) {
      auto [w, via, tp, far_small] = bfs[qi];
      const std::vector<double>& far = far_small ? smallvals : bigvals;
      double coef = std::ldexp(1.0, -tp);
      int py = -1, pz = -1, y = -1, z = -1;
      for (int i = 0; i < 3; ++i) {
        int e2 = t.adj[w][i];
        if (e2 == via) continue;
        if (y < 0) y = e2, py = i;
        else z = e2, pz = i;
      }
      int Yd = away(t, y, w), Zd = away(t, z, w);
      sib[w][py] += coef * (down[Zd] - far[Zd]);
      sib[w][pz] += coef * (down[Yd] - far[Yd]);
      int wy = t.other(y, w), wz = t.other(z, w);
      if (wy >= t.n_leaves) bfs.push_back({wy, y, tp + 1, far_small});
      if (wz >= t.n_leaves) bfs.push_back({wz, z, tp + 1, far_small});
    }
    cache->rebuild(t);
    cache->invalidate_containing({m});
  }
  // Seed the shared cache with the final sibling deltas so the NNI scan
  // (whose refill recursions bottom out on exactly these cells) starts warm.
  for (int v2 = t.n_leaves; v2 < t.n_nodes(); ++v2) {
    const auto& a3 = t.adj[v2];
    if (a3.size() != 3) continue;
    int d0 = away(t, a3[0], v2), d1 = away(t, a3[1], v2),
        d2 = away(t, a3[2], v2);
    cache->put(d1, d2, sib[v2][0]);
    cache->put(d0, d2, sib[v2][1]);
    cache->put(d0, d1, sib[v2][2]);
  }
  return t;
}

Tree bme_greedy(const DistMatrix& dm, DeltaCache* cache) {
  static const bool force_slow = std::getenv("PFTREE_SLOW_BME") != nullptr;
  if (!force_slow && cache && cache->usable() && dm.n >= 3)
    return bme_greedy_fast(dm, cache);
  Tree t = bme_greedy_slow(dm);
  if (cache && cache->usable()) cache->resync_all(t);
  return t;
}

// One balanced-NNI pass: returns true if an improving move was applied.
// Reference version recomputing full balanced tables (O(n^2) per call);
// fallback for trees beyond the cache cap / PFTREE_SLOW_NNI regressions.
bool bnni_step_slow(const DistMatrix& dm, Tree* t, double eps = 1e-12) {
  std::vector<int> map = identity_map(*t, dm);
  BalancedTables bt;
  bt.compute(*t, dm, map);
  double best_gain = -eps;
  int best_e = -1, best_swap = 0;
  for (int e = 0; e < static_cast<int>(t->edges.size()); ++e) {
    int u = t->edges[e].u, v = t->edges[e].v;
    if (u < t->n_leaves || v < t->n_leaves) continue;  // internal edges only
    // subtrees A,B at u; C,D at v (directed away from u/v)
    std::vector<int> ue, ve;
    for (int e2 : t->adj[u])
      if (e2 != e) ue.push_back(away(*t, e2, u));
    for (int e2 : t->adj[v])
      if (e2 != e) ve.push_back(away(*t, e2, v));
    if (ue.size() != 2 || ve.size() != 2) continue;
    int A = ue[0], B = ue[1], C = ve[0], D = ve[1];
    double dAB = bt.delta(A, B), dCD = bt.delta(C, D);
    double dAC = bt.delta(A, C), dBD = bt.delta(B, D);
    double dAD = bt.delta(A, D), dBC = bt.delta(B, C);
    // swap B<->C: new config (A,C | B,D):  dL = ((AC+BD) - (AB+CD)) / 4
    double dl1 = 0.25 * ((dAC + dBD) - (dAB + dCD));
    // swap B<->D: new config (A,D | C,B):  dL = ((AD+BC) - (AB+CD)) / 4
    double dl2 = 0.25 * ((dAD + dBC) - (dAB + dCD));
    if (-dl1 > best_gain) best_gain = -dl1, best_e = e, best_swap = 1;
    if (-dl2 > best_gain) best_gain = -dl2, best_e = e, best_swap = 2;
  }
  if (best_e < 0) return false;
  // apply: swap subtree edge endpoints
  int u = t->edges[best_e].u, v = t->edges[best_e].v;
  std::vector<int> ue, ve;
  for (int e2 : t->adj[u])
    if (e2 != best_e) ue.push_back(e2);
  for (int e2 : t->adj[v])
    if (e2 != best_e) ve.push_back(e2);
  int eb = ue[1];  // B side edge at u
  int ec = best_swap == 1 ? ve[0] : ve[1];
  // move eb from u to v, ec from v to u
  auto repoint = [&](int edge, int from, int to) {
    if (t->edges[edge].u == from)
      t->edges[edge].u = to;
    else
      t->edges[edge].v = to;
    auto& af = t->adj[from];
    af.erase(std::find(af.begin(), af.end(), edge));
    t->adj[to].push_back(edge);
  };
  repoint(eb, u, v);
  repoint(ec, v, u);
  return true;
}

// Gains of the two NNI swaps across internal edge e, from cached deltas.
// Returns false for non-internal / non-binary configurations.
bool nni_gains(const Tree& t, DeltaCache* C, int e, double* gain1,
               double* gain2) {
  int u = t.edges[e].u, v = t.edges[e].v;
  if (u < t.n_leaves || v < t.n_leaves) return false;  // internal edges only
  std::array<int, 2> ue{-1, -1}, ve{-1, -1};
  int cu = 0, cv = 0;
  for (int e2 : t.adj[u])
    if (e2 != e) {
      if (cu == 2) return false;
      ue[cu++] = away(t, e2, u);
    }
  for (int e2 : t.adj[v])
    if (e2 != e) {
      if (cv == 2) return false;
      ve[cv++] = away(t, e2, v);
    }
  if (cu != 2 || cv != 2) return false;
  int A = ue[0], B = ue[1], Cc = ve[0], D = ve[1];
  double dAB = C->at(A, B), dCD = C->at(Cc, D);
  double dAC = C->at(A, Cc), dBD = C->at(B, D);
  double dAD = C->at(A, D), dBC = C->at(B, Cc);
  *gain1 = -0.25 * ((dAC + dBD) - (dAB + dCD));
  *gain2 = -0.25 * ((dAD + dBC) - (dAB + dCD));
  return true;
}

// Apply NNI swap (1: B<->C, 2: B<->D) across internal edge e and refresh the
// cache (only directions containing u/v change contents).
void apply_nni(Tree* t, DeltaCache* C, int e, int swap) {
  int u = t->edges[e].u, v = t->edges[e].v;
  std::vector<int> ue, ve;
  for (int e2 : t->adj[u])
    if (e2 != e) ue.push_back(e2);
  for (int e2 : t->adj[v])
    if (e2 != e) ve.push_back(e2);
  int eb = ue[1];
  int ec = swap == 1 ? ve[0] : ve[1];
  auto repoint = [&](int edge, int from, int to) {
    if (t->edges[edge].u == from)
      t->edges[edge].u = to;
    else
      t->edges[edge].v = to;
    auto& af = t->adj[from];
    af.erase(std::find(af.begin(), af.end(), edge));
    t->adj[to].push_back(edge);
  };
  repoint(eb, u, v);
  repoint(ec, v, u);
  C->rebuild(*t);
  C->invalidate_containing({u, v});
}

// Cache-backed balanced-NNI pass: same scan order, gain formulas and
// tie-breaking as bnni_step_slow, but the six sibling deltas per internal
// edge are memoized DeltaCache lookups instead of full-table recomputes,
// and an applied swap only invalidates directions containing its endpoints.
bool bnni_step_fast(const DistMatrix& dm, Tree* t, DeltaCache* C,
                    double eps = 1e-12) {
  (void)dm;
  double best_gain = -eps;
  int best_e = -1, best_swap = 0;
  for (int e = 0; e < static_cast<int>(t->edges.size()); ++e) {
    double g1, g2;
    if (!nni_gains(*t, C, e, &g1, &g2)) continue;
    if (g1 > best_gain) best_gain = g1, best_e = e, best_swap = 1;
    if (g2 > best_gain) best_gain = g2, best_e = e, best_swap = 2;
  }
  if (best_e < 0) return false;
  apply_nni(t, C, best_e, best_swap);
  return true;
}

// Batched balanced-NNI round (large n): ONE scan records every improving
// swap; they are then applied best-first, each re-verified against the
// CURRENT tree/cache before applying, so the balanced length strictly
// decreases per applied move exactly as in the one-move-per-scan search —
// only the visiting order (and thus possibly which local optimum) differs.
// This removes the full O(n)-edge rescan the search paid per applied move.
// Returns the number of moves applied.
int bnni_round_batch(Tree* t, DeltaCache* C, double eps = 1e-12) {
  struct NniMove {
    double gain;
    int e, swap;
  };
  std::vector<NniMove> moves;
  for (int e = 0; e < static_cast<int>(t->edges.size()); ++e) {
    double g1, g2;
    if (!nni_gains(*t, C, e, &g1, &g2)) continue;
    if (g1 > -eps || g2 > -eps)  // same acceptance threshold as bnni_step
      moves.push_back(g1 >= g2 ? NniMove{g1, e, 1} : NniMove{g2, e, 2});
  }
  std::sort(moves.begin(), moves.end(), [](const NniMove& a, const NniMove& b) {
    return a.gain != b.gain ? a.gain > b.gain : a.e < b.e;
  });
  int applied = 0;
  for (const NniMove& m : moves) {
    double g1, g2;  // re-verify on the current tree; pick the better swap
    if (!nni_gains(*t, C, m.e, &g1, &g2)) continue;
    double g = std::max(g1, g2);
    if (g <= -eps) continue;
    apply_nni(t, C, m.e, g1 >= g2 ? 1 : 2);
    ++applied;
  }
  return applied;
}

bool bnni_step(const DistMatrix& dm, Tree* t, DeltaCache* cache,
               double eps = 1e-12) {
  static const bool force_slow = std::getenv("PFTREE_SLOW_NNI") != nullptr;
  if (!force_slow && cache && cache->usable())
    return bnni_step_fast(dm, t, cache, eps);
  bool moved = bnni_step_slow(dm, t, eps);
  if (moved && cache && cache->usable()) cache->resync_all(*t);
  return moved;
}

// ---------------------------------------------------------------------------
// Fast balanced-SPR (Desper & Gascuel 2002-style recursions)
// ---------------------------------------------------------------------------
//
// The naive sweep (kept below as bspr_step_slow for non-binary trees and
// very large n) copies the tree and rebuilds full balanced tables for every
// prune candidate: O(n^3) per sweep with large constants.  This version
// reads balanced average distances between disjoint directed subtrees,
// delta(sub(d1), sub(d2)), from the persistent DeltaCache (lazily filled by
// the halving recursion and version-invalidated only where an applied move
// changed the tree), then scores every (prune, insertion-edge) pair with a
// DFS walk whose per-edge cost is O(path depth) table lookups:
//
//   cost(f) = 1/2 [ delta(S, X_f) + delta(S, Y_f) - delta(X_f, Y_f) ]
//
// where S is the pruned subtree and X_f/Y_f the two sides of insertion edge
// f in T' = T - S.  The ahead side is an original-tree subtree (direct
// lookup); the behind side is the geometric mixture
// 1/2 Sib_1 + 1/4 Sib_2 + ... + 2^-m Sib_m + 2^-m R0 of original subtrees
// hanging off the walk path, so delta(S, behind) updates in O(1) per step
// and delta(behind, ahead) is an O(m) sum of lookups.  Per sweep:
// O(n^2 + n^2 * avg depth) ~ O(n^2 log n) on balanced trees.

struct SprBest {
  double gain;
  int prune_dir = -1;
  int target_edge = -1;
};

struct SprMove {
  double gain;
  int prune_dir;
  int target_edge;
};

// delta(behind-mixture, sub(d_g)).  sibs = [R0, Sib_m, ..., Sib_1] with
// Sib_1 nearest (weight 1/2) and R0 sharing the farthest sibling's weight.
double mix_delta(DeltaCache& T, const std::vector<int>& sibs, int d_g) {
  for (int s : sibs) T.prefetch(s, d_g);
  double acc = 0.0, w = 0.5;
  for (int k = static_cast<int>(sibs.size()) - 1; k >= 1; --k) {
    acc += w * T.at(sibs[k], d_g);
    if (k > 1) w *= 0.5;
  }
  acc += w * T.at(sibs[0], d_g);
  return acc;
}

// DFS over one insertion cone for pruned subtree sub(dS).  When `moves` is
// non-null, every improving (prune, target) pair is also recorded for the
// batched large-n application path.  `path_dirty` says whether any
// direction contributing to the costs so far (the pruned subtree, the base
// directions, the accumulated siblings) changed version since the previous
// scan's snapshot; a clean path into a clean cone reproduces last scan's
// (non-improving) costs exactly and is skipped.  Only the batched mode
// snapshots, so `path_dirty` is always true in single-move mode (full scan,
// reference semantics preserved).
void spr_walk(const Tree& t, DeltaCache& T, int dS, int d_g, double sA,
              std::vector<int>* sibs, double base_cost, SprBest* best,
              std::vector<SprMove>* moves, double record_eps,
              bool path_dirty) {
  if (!path_dirty && !T.dirty_sub(d_g)) return;
  double cost =
      0.5 * (sA + T.at(dS, d_g) - mix_delta(T, *sibs, d_g));
  double gain = base_cost - cost;
  if (gain > best->gain) {
    best->gain = gain;
    best->prune_dir = dS;
    best->target_edge = d_g / 2;
  }
  if (moves && gain > record_eps)
    moves->push_back({gain, dS, d_g / 2});
  int h = T.head(d_g);
  if (h < t.n_leaves) return;
  std::array<int, 2> kid_edges{-1, -1};
  int k = 0;
  for (int e2 : t.adj[h])
    if (e2 != d_g / 2) kid_edges[k++] = e2;
  for (int i = 0; i < 2; ++i) {
    int down = away(t, kid_edges[i], h);
    int sib = away(t, kid_edges[1 - i], h);
    sibs->push_back(sib);
    spr_walk(t, T, dS, down, 0.5 * T.at(dS, sib) + 0.5 * sA, sibs, base_cost,
             best, moves, record_eps, path_dirty || T.dirty(sib));
    sibs->pop_back();
  }
}

// Incremental-mixture variant of spr_walk (batched mode only): carries
// c = delta(behind, sub(d_g)) down the walk so the cost at each target is
// O(1).  One child's a0 = delta(behind, down0) costs one O(m) mixture; the
// other is a1 = 2c - a0 (exact: delta(B, d_g) halves over d_g's kids), and
// each child's c is then 0.5*delta(sib, down) + 0.5*a — so the O(m)
// mixture runs once per INTERNAL node instead of once per target (~2x
// fewer lookups; the scan is lookup-latency bound).  The one-move mode
// keeps the direct-mixture spr_walk: a1's subtraction rounds differently
// at the last ulp, and reference visiting-order semantics must not shift.
// Batched applications stay exact regardless: every recorded gain is
// re-verified with spr_gain_current (direct mixtures) before applying.
void spr_walk_inc(const Tree& t, DeltaCache& T, int dS, int d_g, double sA,
                  double c, std::vector<int>* sibs, double base_cost,
                  SprBest* best, std::vector<SprMove>* moves,
                  double record_eps, bool path_dirty) {
  if (!path_dirty && !T.dirty_sub(d_g)) return;
  double cost = 0.5 * (sA + T.at(dS, d_g) - c);
  double gain = base_cost - cost;
  if (gain > best->gain) {
    best->gain = gain;
    best->prune_dir = dS;
    best->target_edge = d_g / 2;
  }
  if (moves && gain > record_eps)
    moves->push_back({gain, dS, d_g / 2});
  int h = T.head(d_g);
  if (h < t.n_leaves) return;
  std::array<int, 2> kid_edges{-1, -1};
  int k = 0;
  for (int e2 : t.adj[h])
    if (e2 != d_g / 2) kid_edges[k++] = e2;
  int down0 = away(t, kid_edges[0], h);
  int down1 = away(t, kid_edges[1], h);
  double a0 = mix_delta(T, *sibs, down0);
  double a1 = 2.0 * c - a0;
  double d01 = T.at(down0, down1);
  // child 0 (sibling = down1), then child 1 (sibling = down0) — the same
  // visiting order as spr_walk's kid loop
  sibs->push_back(down1);
  spr_walk_inc(t, T, dS, down0, 0.5 * T.at(dS, down1) + 0.5 * sA,
               0.5 * d01 + 0.5 * a0, sibs, base_cost, best, moves,
               record_eps, path_dirty || T.dirty(down1));
  sibs->pop_back();
  sibs->push_back(down0);
  spr_walk_inc(t, T, dS, down1, 0.5 * T.at(dS, down0) + 0.5 * sA,
               0.5 * d01 + 0.5 * a1, sibs, base_cost, best, moves,
               record_eps, path_dirty || T.dirty(down0));
  sibs->pop_back();
}

// Targeted variant: find `target` in the cone below d_g and return its
// insertion cost (current tree, current cache).  Returns false if target is
// not in this cone.
bool spr_find_cost(const Tree& t, DeltaCache& T, int dS, int d_g, double sA,
                   std::vector<int>* sibs, int target, double* cost) {
  if (d_g / 2 == target) {
    *cost = 0.5 * (sA + T.at(dS, d_g) - mix_delta(T, *sibs, d_g));
    return true;
  }
  int h = T.head(d_g);
  if (h < t.n_leaves) return false;
  std::array<int, 2> kid_edges{-1, -1};
  int k = 0;
  for (int e2 : t.adj[h])
    if (e2 != d_g / 2) kid_edges[k++] = e2;
  for (int i = 0; i < 2; ++i) {
    int down = away(t, kid_edges[i], h);
    int sib = away(t, kid_edges[1 - i], h);
    sibs->push_back(sib);
    bool found = spr_find_cost(t, T, dS, down, 0.5 * T.at(dS, sib) + 0.5 * sA,
                               sibs, target, cost);
    sibs->pop_back();
    if (found) return true;
  }
  return false;
}

// Exact gain of re-inserting sub(d) at `target`, evaluated on the CURRENT
// tree/cache (used to re-verify stale gains during batched application).
// Sets *ok=false when the move is no longer structurally valid.
double spr_gain_current(const Tree& t, DeltaCache& T, int d, int target,
                        bool* ok) {
  *ok = false;
  int e = d / 2;
  int tail = d % 2 == 0 ? t.edges[e].u : t.edges[e].v;
  if (tail < t.n_leaves) return 0.0;
  std::array<int, 2> tail_edges{-1, -1};
  int k = 0;
  for (int e2 : t.adj[tail]) {
    if (e2 == e) continue;
    if (k == 2) return 0.0;
    tail_edges[k++] = e2;
  }
  if (k != 2) return 0.0;
  if (target == e || target == tail_edges[0] || target == tail_edges[1])
    return 0.0;
  int d_ta = away(t, tail_edges[0], tail);
  int d_tb = away(t, tail_edges[1], tail);
  double base = 0.5 * (T.at(d, d_ta) + T.at(d, d_tb) - T.at(d_ta, d_tb));
  std::vector<int> sibs;
  sibs.reserve(64);
  for (int side = 0; side < 2; ++side) {
    int d_in = side == 0 ? d_ta : d_tb;
    int d_r0 = side == 0 ? d_tb : d_ta;
    int ta = T.head(d_in);
    if (ta < t.n_leaves) continue;
    std::array<int, 2> cone{-1, -1};
    int c = 0;
    for (int e2 : t.adj[ta])
      if (e2 != tail_edges[side]) cone[c++] = e2;
    for (int i = 0; i < 2; ++i) {
      int down = away(t, cone[i], ta);
      int sib = away(t, cone[1 - i], ta);
      sibs.clear();
      sibs.push_back(d_r0);
      sibs.push_back(sib);
      double sA = 0.5 * T.at(d, sib) + 0.5 * T.at(d, d_r0);
      double cost;
      if (spr_find_cost(t, T, d, down, sA, &sibs, target, &cost)) {
        *ok = true;
        return base - cost;
      }
    }
  }
  return 0.0;  // target no longer reachable from this prune point
}

// Apply one SPR move (prune sub(d), re-insert on `target`) and refresh the
// cache.  Preconditions as established by spr_gain_current / the sweep.
void apply_spr_move(Tree* t, DeltaCache* cache, int d, int target) {
  int e = d / 2;
  int tail = d % 2 == 0 ? t->edges[e].u : t->edges[e].v;
  std::vector<int> tail_edges;
  for (int e2 : t->adj[tail])
    if (e2 != e) tail_edges.push_back(e2);
  int ea = tail_edges[0], eb2 = tail_edges[1];
  int ta = t->other(ea, tail);
  int tb = t->other(eb2, tail);
  // merge ea to span ta-tb; free eb2; tail keeps only edge e
  double mlen = t->edges[ea].len + t->edges[eb2].len;
  if (t->edges[ea].u == tail)
    t->edges[ea].u = tb;
  else
    t->edges[ea].v = tb;
  t->edges[ea].len = mlen;
  auto& atail = t->adj[tail];
  atail.erase(std::find(atail.begin(), atail.end(), ea));
  atail.erase(std::find(atail.begin(), atail.end(), eb2));
  t->adj[tb].push_back(ea);
  auto& atb = t->adj[tb];
  atb.erase(std::find(atb.begin(), atb.end(), eb2));
  // split the target edge (never ea/eb2/e: the cones exclude them),
  // reusing `tail` as the junction and eb2 as the new edge slot
  int u = t->edges[target].u, v = t->edges[target].v;
  double half = t->edges[target].len / 2;
  t->edges[target] = {u, tail, half};
  auto& av = t->adj[v];
  av.erase(std::find(av.begin(), av.end(), target));
  t->adj[tail].push_back(target);
  t->edges[eb2] = {tail, v, half};
  t->adj[tail].push_back(eb2);
  t->adj[v].push_back(eb2);
  // Cached entries stay valid except where subtree contents or the rewired
  // edge slots (ea, eb2, target) changed: every such direction's subtree
  // contains one of the five touched vertices.
  cache->rebuild(*t);
  cache->invalidate_containing({tail, ta, tb, u, v});
}

// One fast balanced-SPR sweep; returns true if an improving move was applied,
// false if none exists.  Sets *ok=false (and returns false) when the tree
// shape or size requires the slow fallback.  Reads deltas from the shared
// DeltaCache (which must be in sync with *t) and, after applying a move,
// invalidates only the directions whose subtree touches the changed region.
//
// `batch=false` replicates the reference semantics exactly: apply the single
// best move per sweep, rescan.  `batch=true` (large n) applies EVERY
// improving move found by the sweep, best-first, re-verifying each gain
// against the current tree (`spr_gain_current`) before applying — the
// balanced length still strictly decreases per applied move (exact
// verification, not the stale sweep value), so the search terminates at a
// local optimum of the same SPR neighborhood; only the visiting order —
// and thus possibly which local optimum — differs.  This cuts the number
// of O(n² · depth) sweeps from ~#moves to ~log(#moves): measured 110 s →
// ~6 s for a full --nni --spr build at n=800.
bool bspr_step_fast(const DistMatrix& dm, Tree* t, double eps, bool* ok,
                    DeltaCache* cache, bool batch) {
  (void)dm;
  *ok = true;
  int ne = static_cast<int>(t->edges.size());
  if (ne < 4) return false;
  if (!cache || !cache->usable()) {
    *ok = false;
    return false;
  }
  DeltaCache& T = *cache;
  // Dirt flags vs the previous batched scan's snapshot (everything dirty
  // when no snapshot exists — first sweep, or single-move mode throughout).
  T.refresh_dirty();
  static const bool debug = std::getenv("PFTREE_DEBUG") != nullptr;
  double t_scan0 = 0;
  int n_dirty = 0;
  if (debug) {
    t_scan0 = std::chrono::duration<double>(
                  std::chrono::steady_clock::now().time_since_epoch())
                  .count();
    for (int d = 0; d < 2 * ne; ++d) n_dirty += T.dirty(d);
  }

  SprBest best{eps};
  std::vector<SprMove> moves;
  // Scan one range of prune directions; thread-confined outputs.  The scan
  // only READS tree structure and version/dirt arrays — at() fills are the
  // sole shared mutation and are made safe by the cell atomics.
  auto scan_range = [&](int d_lo, int d_hi, SprBest* rbest,
                        std::vector<SprMove>* rmoves) {
    std::vector<int> sibs;
    sibs.reserve(64);
    for (int d = d_lo; d < d_hi; ++d) {
      int e = d / 2;
      int tail = d % 2 == 0 ? t->edges[e].u : t->edges[e].v;
      if (tail < t->n_leaves) continue;  // tail must be internal to prune
      std::array<int, 2> tail_edges{-1, -1};
      int k = 0;
      for (int e2 : t->adj[tail])
        if (e2 != e) tail_edges[k++] = e2;
      int d_ta = away(*t, tail_edges[0], tail);
      int d_tb = away(*t, tail_edges[1], tail);
      // cost of re-inserting at the merged edge (= current position)
      double base =
          0.5 * (T.at(d, d_ta) + T.at(d, d_tb) - T.at(d_ta, d_tb));
      bool base_dirty = T.dirty(d) || T.dirty(d_ta) || T.dirty(d_tb);
      for (int side = 0; side < 2; ++side) {
        int d_in = side == 0 ? d_ta : d_tb;   // cone entered
        int d_r0 = side == 0 ? d_tb : d_ta;   // far side of the merged edge
        int ta = T.head(d_in);
        if (ta < t->n_leaves) continue;
        std::array<int, 2> cone{-1, -1};
        int c = 0;
        for (int e2 : t->adj[ta])
          if (e2 != tail_edges[side]) cone[c++] = e2;
        for (int i = 0; i < 2; ++i) {
          int down = away(*t, cone[i], ta);
          int sib = away(*t, cone[1 - i], ta);
          sibs.clear();
          sibs.push_back(d_r0);
          sibs.push_back(sib);
          double sA = 0.5 * T.at(d, sib) + 0.5 * T.at(d, d_r0);
          if (batch) {
            double c0 = 0.5 * T.at(sib, down) + 0.5 * T.at(d_r0, down);
            spr_walk_inc(*t, T, d, down, sA, c0, &sibs, base, rbest,
                         rmoves, eps, base_dirty || T.dirty(sib));
          } else {
            spr_walk(*t, T, d, down, sA, &sibs, base, rbest, nullptr, eps,
                     base_dirty || T.dirty(sib));
          }
        }
      }
    }
  };
  int n_threads = 1;
  if (batch) {  // single-move mode keeps the reference visiting order exact
    unsigned hw = std::thread::hardware_concurrency();
    n_threads = std::max(1, std::min<int>(hw ? hw : 1, 16));
    if (const char* env = std::getenv("PFTREE_THREADS"))
      n_threads = std::max(1, atoi(env));
  }
  if (n_threads <= 1) {
    scan_range(0, 2 * ne, &best, &moves);
  } else {
    std::vector<SprBest> bests(n_threads, SprBest{eps});
    std::vector<std::vector<SprMove>> mvs(n_threads);
    std::vector<std::thread> pool;
    int chunk = (2 * ne + n_threads - 1) / n_threads;
    for (int ti = 0; ti < n_threads; ++ti)
      pool.emplace_back(scan_range, ti * chunk,
                        std::min(2 * ne, (ti + 1) * chunk), &bests[ti],
                        &mvs[ti]);
    for (auto& th : pool) th.join();
    for (int ti = 0; ti < n_threads; ++ti) {
      if (bests[ti].gain > best.gain) best = bests[ti];
      moves.insert(moves.end(), mvs[ti].begin(), mvs[ti].end());
    }
  }

  // The scan above read every delta it used under the current versions;
  // snapshot them so the next batched scan can skip cones no applied move
  // (or interleaved NNI) touches.  Single-move mode never snapshots: its
  // next sweep must re-find the improving moves it did not apply.
  if (batch) T.snapshot_versions();

  if (best.prune_dir < 0) return false;

  if (!batch) {
    apply_spr_move(t, cache, best.prune_dir, best.target_edge);
    return true;
  }

  // Deterministic total order (gain desc, then ids): the merged move set is
  // identical for any thread count, so the applied sequence — and the final
  // tree — does not depend on PFTREE_THREADS.
  std::sort(moves.begin(), moves.end(),
            [](const SprMove& a, const SprMove& b) {
              if (a.gain != b.gain) return a.gain > b.gain;
              if (a.prune_dir != b.prune_dir) return a.prune_dir < b.prune_dir;
              return a.target_edge < b.target_edge;
            });
  double t_apply0 = 0;
  if (debug)
    t_apply0 = std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
                   .count();
  int applied = 0;
  for (const SprMove& m : moves) {
    bool valid = false;
    double gain = spr_gain_current(*t, T, m.prune_dir, m.target_edge, &valid);
    if (!valid || gain <= eps) continue;
    apply_spr_move(t, cache, m.prune_dir, m.target_edge);
    ++applied;
  }
  if (debug) {
    double t_end = std::chrono::duration<double>(
                       std::chrono::steady_clock::now().time_since_epoch())
                       .count();
    fprintf(stderr,
            "[pftree]   spr round: dirty %d/%d scan %.2fs apply %.2fs "
            "(%d recorded, %d applied)\n",
            n_dirty, 2 * ne, t_apply0 - t_scan0, t_end - t_apply0,
            static_cast<int>(moves.size()), applied);
  }
  return applied > 0;
}

// One balanced-SPR sweep: prune every subtree, slide to the best edge.
// Returns true if an improving move was applied.  Slow O(n^3) version kept
// as the fallback for non-binary trees (bspr_step_fast covers the rest).
bool bspr_step_slow(const DistMatrix& dm, Tree* t, double eps = 1e-10) {
  int ne = static_cast<int>(t->edges.size());
  if (ne < 4) return false;
  std::vector<int> map = identity_map(*t, dm);
  BalancedTables bt_full;
  bt_full.compute(*t, dm, map);

  double best_gain = eps;
  int best_prune_dir = -1, best_insert_u = -1, best_insert_v = -1;

  for (int d = 0; d < 2 * ne; ++d) {
    int e = d / 2;
    int head = d % 2 == 0 ? t->edges[e].v : t->edges[e].u;
    int tail = d % 2 == 0 ? t->edges[e].u : t->edges[e].v;
    if (tail < t->n_leaves) continue;  // tail must be internal to prune
    // S = subtree(d) rooted at `head`; prune: remove edge e and suppress tail.
    // T' = rest. Build T' as a copy.
    Tree tp;
    tp.n_leaves = t->n_leaves;
    tp.leaf_names = t->leaf_names;
    tp.adj.resize(t->n_nodes());
    // mark nodes in S via DFS from head avoiding edge e
    std::vector<char> in_s(t->n_nodes(), 0);
    {
      std::vector<int> stack{head};
      in_s[head] = 1;
      while (!stack.empty()) {
        int x = stack.back();
        stack.pop_back();
        for (int e2 : t->adj[x]) {
          if (e2 == e) continue;
          int y = t->other(e2, x);
          if (!in_s[y]) in_s[y] = 1, stack.push_back(y);
        }
      }
    }
    // the two other edges at tail get merged into one
    std::vector<int> tail_edges;
    for (int e2 : t->adj[tail])
      if (e2 != e) tail_edges.push_back(e2);
    if (tail_edges.size() != 2) continue;
    int ta = t->other(tail_edges[0], tail);
    int tb = t->other(tail_edges[1], tail);
    int merged_u = ta, merged_v = tb;
    for (int e2 = 0; e2 < ne; ++e2) {
      if (e2 == e || e2 == tail_edges[0] || e2 == tail_edges[1]) continue;
      if (in_s[t->edges[e2].u]) continue;  // S-internal edges excluded
      tp.add_edge(t->edges[e2].u, t->edges[e2].v, t->edges[e2].len);
    }
    int merged_edge = tp.add_edge(merged_u, merged_v,
                                  t->edges[tail_edges[0]].len +
                                      t->edges[tail_edges[1]].len);
    // leaves present in T'
    int n_rest = 0;
    for (int i = 0; i < t->n_leaves; ++i)
      if (!in_s[i]) ++n_rest;
    if (n_rest < 2) continue;

    BalancedTables bt;
    bt.compute(tp, dm, map);  // absent leaves have zero weight rows

    // distance profile of S with balanced weights from bt_full (w[d])
    std::vector<double> ds(dm.n, 0.0);
    for (int tt = 0; tt < dm.n; ++tt) {
      double s = bt_full.dv[d][tt];
      ds[tt] = s;
    }

    // score(f) = 1/2 (delta(S, Xf) + delta(S, Yf) - delta(Xf, Yf))
    auto score = [&](int f) {
      return 0.5 * (bt.delta_set(ds, BalancedTables::fwd(f)) +
                    bt.delta_set(ds, BalancedTables::rev(f)) -
                    bt.delta_split(f));
    };
    double base = score(merged_edge);  // re-inserting at original spot
    for (int f = 0; f < static_cast<int>(tp.edges.size()); ++f) {
      double gain = base - score(f);
      if (gain > best_gain) {
        best_gain = gain;
        best_prune_dir = d;
        best_insert_u = tp.edges[f].u;
        best_insert_v = tp.edges[f].v;
      }
    }
  }

  if (best_prune_dir < 0) return false;

  // apply: prune S at best_prune_dir, reinsert on edge (best_insert_u, best_insert_v)
  int d = best_prune_dir;
  int e = d / 2;
  int tail = d % 2 == 0 ? t->edges[e].u : t->edges[e].v;
  std::vector<int> tail_edges;
  for (int e2 : t->adj[tail])
    if (e2 != e) tail_edges.push_back(e2);
  int ea = tail_edges[0], eb2 = tail_edges[1];
  int ta = t->other(ea, tail), tb = t->other(eb2, tail);
  // merge ea to span ta-tb; delete eb2; detach tail except edge e
  double mlen = t->edges[ea].len + t->edges[eb2].len;
  if (t->edges[ea].u == tail)
    t->edges[ea].u = tb;
  else
    t->edges[ea].v = tb;
  t->edges[ea].len = mlen;
  auto& atail = t->adj[tail];
  atail.erase(std::find(atail.begin(), atail.end(), ea));
  atail.erase(std::find(atail.begin(), atail.end(), eb2));
  t->adj[tb].push_back(ea);
  auto& atb = t->adj[tb];
  atb.erase(std::find(atb.begin(), atb.end(), eb2));
  auto& ata = t->adj[ta];
  (void)ata;
  // mark eb2 as dead by making it a self-loop on tail we won't traverse;
  // we compact edges below.
  t->edges[eb2] = {-1, -1, 0.0};

  // find the target edge in t (by endpoints) — it is either an original edge
  // or the merged edge ea
  int target = -1;
  for (int f = 0; f < static_cast<int>(t->edges.size()); ++f) {
    if (t->edges[f].u < 0) continue;
    if ((t->edges[f].u == best_insert_u && t->edges[f].v == best_insert_v) ||
        (t->edges[f].u == best_insert_v && t->edges[f].v == best_insert_u)) {
      target = f;
      break;
    }
  }
  if (target < 0) {
    // merged edge endpoints in tp were (merged_u, merged_v) = (ta, tb) -> ea
    target = ea;
  }
  // split target, attach tail (reusing `tail` as the new junction node)
  int u = t->edges[target].u, v = t->edges[target].v;
  double half = t->edges[target].len / 2;
  t->edges[target] = {u, tail, half};
  auto& av = t->adj[v];
  av.erase(std::find(av.begin(), av.end(), target));
  t->adj[tail].push_back(target);
  // reuse dead edge slot eb2 for the new edge tail-v
  t->edges[eb2] = {tail, v, half};
  t->adj[tail].push_back(eb2);
  t->adj[v].push_back(eb2);
  return true;
}

bool bspr_step(const DistMatrix& dm, Tree* t, DeltaCache* cache,
               double eps = 1e-10) {
  // test/benchmark escape hatch: force the O(n^3) reference sweep
  static const bool force_slow = std::getenv("PFTREE_SLOW_SPR") != nullptr;
  if (!force_slow) {
    // Batched application above the exact-semantics size threshold (the
    // one-move-per-sweep path matches the slow reference sweep move for
    // move; PFTREE_SPR_BATCH=0/1 overrides).
    bool batch = t->n_leaves >= 128;
    if (const char* env = std::getenv("PFTREE_SPR_BATCH"))
      batch = std::atoi(env) != 0;
    bool ok = false;
    bool moved = bspr_step_fast(dm, t, eps, &ok, cache, batch);
    if (ok) return moved;
  }
  bool moved = bspr_step_slow(dm, t, eps);
  if (moved && cache && cache->usable()) cache->resync_all(*t);
  return moved;
}

}  // namespace

void assign_balanced_lengths(const DistMatrix& dm, Tree* t) {
  std::vector<int> map = identity_map(*t, dm);
  if (t->n_leaves == 2) {
    // split distance across however many edges exist
    double total = dm(map[0], map[1]);
    double per = total / t->edges.size();
    for (auto& e : t->edges) e.len = per;
    return;
  }
  BalancedTables bt;
  bt.compute(*t, dm, map);
  for (int e = 0; e < static_cast<int>(t->edges.size()); ++e) {
    int u = t->edges[e].u, v = t->edges[e].v;
    bool u_leaf = u < t->n_leaves, v_leaf = v < t->n_leaves;
    if (u_leaf || v_leaf) {
      int leaf = u_leaf ? u : v;
      int inner = u_leaf ? v : u;
      std::vector<int> rest;
      for (int e2 : t->adj[inner])
        if (e2 != e) rest.push_back(away(*t, e2, inner));
      if (rest.size() == 2) {
        double dA = bt.delta(2 * e + (t->edges[e].v == leaf ? 0 : 1), rest[0]);
        // delta(leaf, A): leaf subtree is the directed edge pointing AT the leaf
        int dleaf = t->edges[e].v == leaf ? 2 * e : 2 * e + 1;
        double diA = bt.delta(dleaf, rest[0]);
        double diB = bt.delta(dleaf, rest[1]);
        double dABr = bt.delta(rest[0], rest[1]);
        (void)dA;
        t->edges[e].len = std::max(0.5 * (diA + diB - dABr), 0.0);
      }
    } else {
      std::vector<int> ue, ve;
      for (int e2 : t->adj[u])
        if (e2 != e) ue.push_back(away(*t, e2, u));
      for (int e2 : t->adj[v])
        if (e2 != e) ve.push_back(away(*t, e2, v));
      if (ue.size() == 2 && ve.size() == 2) {
        double dAC = bt.delta(ue[0], ve[0]), dBD = bt.delta(ue[1], ve[1]);
        double dAD = bt.delta(ue[0], ve[1]), dBC = bt.delta(ue[1], ve[0]);
        double dAB = bt.delta(ue[0], ue[1]), dCD = bt.delta(ve[0], ve[1]);
        t->edges[e].len = std::max(
            0.5 * ((dAC + dBD + dAD + dBC) / 2 - dAB - dCD), 0.0);
      }
    }
  }
}

Tree build_tree(const DistMatrix& dm, const std::string& method, bool nni,
                bool spr) {
  // One pair-delta cache shared by construction, NNI and SPR: greedy BME
  // insertion finishes with a warm cache the topology search keeps reusing.
  // Trees we construct always use leaf ids in dm order, so the map is the
  // identity.  Beyond the memory cap the cache stays unusable and every
  // stage falls back to its full-table path (previous behavior).
  static const bool debug = std::getenv("PFTREE_DEBUG") != nullptr;
  auto now = [] {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
  };
  std::vector<int> map(dm.n);
  for (int i = 0; i < dm.n; ++i) map[i] = i;
  DeltaCache cache;
  cache.alloc(dm.n, dm, map);

  double t0 = now();
  Tree t;
  if (method == "nj" || method == "bionj") {
    t = method == "nj" ? nj_tree(dm) : bionj_tree(dm);
    if (cache.usable()) cache.rebuild(t);  // fresh cache: all entries cold
  } else {
    t = bme_greedy(dm, &cache);
  }
  if (debug)
    fprintf(stderr, "[pftree] construct: %.2fs\n", now() - t0);
  if (dm.n >= 4) {
    bool moved = true;
    int guard = 0;
    double t_nni = 0, t_spr = 0;
    int nni_moves = 0, spr_rounds = 0;
    // Batched NNI above the same size threshold as batched SPR (and under
    // the same env overrides): one scan per round instead of one per move.
    bool nni_batch = dm.n >= 128 && cache.usable() &&
                     std::getenv("PFTREE_SLOW_NNI") == nullptr;
    if (const char* env = std::getenv("PFTREE_NNI_BATCH"))
      nni_batch = cache.usable() && env[0] == '1';
    while (moved && guard < 200 * dm.n) {
      moved = false;
      if (nni) {
        double s = now();
        if (nni_batch) {
          int k;
          while ((k = bnni_round_batch(&t, &cache)) > 0 &&
                 (guard += k) < 200 * dm.n) {
            moved = true;
            nni_moves += k;
          }
        } else {
          while (bnni_step(dm, &t, &cache) && ++guard < 200 * dm.n) {
            moved = true;
            ++nni_moves;
          }
        }
        t_nni += now() - s;
      }
      if (spr) {
        double s = now();
        bool m = bspr_step(dm, &t, &cache);
        t_spr += now() - s;
        if (m) {
          moved = true;
          ++guard;
          ++spr_rounds;
        }
      }
    }
    if (debug)
      fprintf(stderr,
              "[pftree] nni: %.2fs (%d moves)  spr: %.2fs (%d rounds)\n",
              t_nni, nni_moves, t_spr, spr_rounds);
  }
  double t1 = now();
  assign_balanced_lengths(dm, &t);
  if (debug)
    fprintf(stderr, "[pftree] lengths: %.2fs\n", now() - t1);
  return t;
}

// ---------------------------------------------------------------------------
// Comparison
// ---------------------------------------------------------------------------

namespace {

using Bits = std::vector<uint64_t>;

struct Bipartitions {
  // canonical bitset (taxon-sorted ids, bit for name-rank) -> branch length
  std::map<Bits, double> internal;
  std::map<int, double> external;  // name-rank -> leaf branch length
};

Bipartitions bipartitions(const Tree& t, const std::vector<int>& rank, int n) {
  Bipartitions out;
  int words = (n + 63) / 64;
  int ne = static_cast<int>(t.edges.size());
  std::vector<Bits> below(2 * ne);
  // For each directed edge compute leaf set via DFS with memo (postorder).
  std::function<const Bits&(int)> get = [&](int d) -> const Bits& {
    if (!below[d].empty()) return below[d];
    Bits b(words, 0);
    int e = d / 2;
    int head = d % 2 == 0 ? t.edges[e].v : t.edges[e].u;
    if (head < t.n_leaves) {
      int r = rank[head];
      b[r / 64] |= (uint64_t{1} << (r % 64));
    } else {
      for (int e2 : t.adj[head]) {
        if (e2 == e) continue;
        int cd = (t.edges[e2].u == head) ? 2 * e2 : 2 * e2 + 1;
        const Bits& cb = get(cd);
        for (int wd = 0; wd < words; ++wd) b[wd] |= cb[wd];
      }
    }
    below[d] = std::move(b);
    return below[d];
  };

  for (int e = 0; e < ne; ++e) {
    const Bits& b = get(2 * e);
    int count = 0;
    for (uint64_t wd : b) count += __builtin_popcountll(wd);
    if (count == 1 || count == n - 1) {
      // external edge
      int leaf = t.edges[e].v < t.n_leaves ? t.edges[e].v
                : (t.edges[e].u < t.n_leaves ? t.edges[e].u : -1);
      if (leaf >= 0) out.external[rank[leaf]] += t.edges[e].len;
      continue;
    }
    if (count == 0 || count == n) continue;
    // canonical: ensure bit 0 is clear (complement-invariant)
    Bits canon = b;
    if (canon[0] & 1) {
      for (int wd = 0; wd < words; ++wd) canon[wd] = ~canon[wd];
      // clear padding bits
      int extra = words * 64 - n;
      if (extra > 0) canon[words - 1] &= (~uint64_t{0}) >> extra;
    }
    out.internal[canon] += t.edges[e].len;
  }
  return out;
}

}  // namespace

CompareResult compare_trees(const Tree& a, const Tree& b, bool include_external) {
  std::vector<std::string> names_a = a.leaf_names, names_b = b.leaf_names;
  std::sort(names_a.begin(), names_a.end());
  std::sort(names_b.begin(), names_b.end());
  if (names_a != names_b)
    throw std::runtime_error("compare_trees: leaf sets differ");
  int n = static_cast<int>(names_a.size());
  auto rank_of = [&](const Tree& t) {
    std::vector<int> rank(t.n_leaves);
    for (int i = 0; i < t.n_leaves; ++i)
      rank[i] = static_cast<int>(
          std::lower_bound(names_a.begin(), names_a.end(), t.leaf_names[i]) -
          names_a.begin());
    return rank;
  };
  Bipartitions ba = bipartitions(a, rank_of(a), n);
  Bipartitions bb = bipartitions(b, rank_of(b), n);

  CompareResult res;
  double sq = 0, wsum = 0;
  int common = 0;
  for (const auto& [bits, len] : ba.internal) {
    auto it = bb.internal.find(bits);
    double other = it == bb.internal.end() ? 0.0 : it->second;
    if (it != bb.internal.end()) ++common;
    sq += (len - other) * (len - other);
    wsum += std::abs(len - other);
  }
  for (const auto& [bits, len] : bb.internal) {
    if (ba.internal.count(bits)) continue;
    sq += len * len;
    wsum += len;
  }
  if (include_external) {
    for (const auto& [r, len] : ba.external) {
      double other = bb.external.count(r) ? bb.external.at(r) : 0.0;
      sq += (len - other) * (len - other);
      wsum += std::abs(len - other);
    }
  }
  res.n_common = common;
  res.rf = static_cast<double>(ba.internal.size() + bb.internal.size() -
                               2 * common);
  int denom = 2 * std::max(n - 3, 1);
  res.norm_rf = res.rf / denom;
  res.weighted_rf = wsum;
  res.kf = std::sqrt(sq);
  return res;
}

}  // namespace pftree
