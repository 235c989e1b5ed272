// pf-phylocompare: batch tree-vs-tree comparison, replacement for the
// reference's Rust `phylocompare` (README.md:95-99). Compares same-named
// .nwk files in two directories and writes a CSV:
//   id,rf,norm_rf,weighted_rf,kf_score,n_common
#include <algorithm>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "pftree.h"

static std::string slurp(const std::string& p) {
  std::ifstream in(p);
  std::stringstream ss;
  ss << in.rdbuf();
  return ss.str();
}

int main(int argc, char** argv) {
  std::string ref_dir, cmp_dir, out_csv;
  bool include_external = false;  // phylocompare kf_score convention
  std::vector<std::string> pos;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if ((a == "-o" || a == "--output") && i + 1 < argc) out_csv = argv[++i];
    else if (a == "--internal-only") include_external = false;
    else if (a == "--include-external") include_external = true;
    else if (a == "-t" || a == "-n") continue;  // reference-flag compat (no-ops)
    else if (a == "-h" || a == "--help") {
      std::puts("usage: pf-phylocompare [-o out.csv] [--internal-only] ref_dir cmp_dir");
      return 0;
    } else pos.push_back(a);
  }
  if (pos.size() == 2) { ref_dir = pos[0]; cmp_dir = pos[1]; }
  else if (pos.size() == 1) { ref_dir = pos[0]; }
  if (ref_dir.empty() || cmp_dir.empty()) {
    std::fprintf(stderr, "pf-phylocompare: need ref_dir and cmp_dir\n");
    return 2;
  }

  std::vector<std::string> files;
  if (DIR* d = opendir(ref_dir.c_str())) {
    while (dirent* ent = readdir(d)) {
      std::string name = ent->d_name;
      if (name.size() > 4 && name.substr(name.size() - 4) == ".nwk")
        files.push_back(name);
    }
    closedir(d);
  } else {
    std::fprintf(stderr, "pf-phylocompare: cannot open %s\n", ref_dir.c_str());
    return 2;
  }
  std::sort(files.begin(), files.end());

  std::ostringstream csv;
  csv << "id,rf,norm_rf,weighted_rf,kf_score,n_common\n";
  double kf_sum = 0;
  int count = 0;
  for (const std::string& f : files) {
    std::string stem = f.substr(0, f.size() - 4);
    // strip known suffixes from cmp naming (e.g. "<stem>.nj" vs "<stem>")
    std::string cmp_path = cmp_dir + "/" + f;
    std::ifstream probe(cmp_path);
    if (!probe) {
      // try "<stem>.nj.nwk" / "<stem>.bme.nwk" style alternates
      const char* alts[] = {".nj.nwk", ".bme.nwk", ".nwk"};
      bool found = false;
      for (const char* alt : alts) {
        cmp_path = cmp_dir + "/" + stem + alt;
        std::ifstream p2(cmp_path);
        if (p2) { found = true; break; }
      }
      if (!found) continue;
    }
    try {
      pftree::Tree a = pftree::parse_newick(slurp(ref_dir + "/" + f));
      pftree::Tree b = pftree::parse_newick(slurp(cmp_path));
      pftree::CompareResult r = pftree::compare_trees(a, b, include_external);
      csv << stem << ',' << r.rf << ',' << r.norm_rf << ',' << r.weighted_rf
          << ',' << r.kf << ',' << r.n_common << '\n';
      kf_sum += r.kf;
      ++count;
    } catch (const std::exception& e) {
      std::fprintf(stderr, "pf-phylocompare: %s: %s\n", f.c_str(), e.what());
    }
  }
  if (out_csv.empty()) {
    std::fputs(csv.str().c_str(), stdout);
  } else {
    std::ofstream out(out_csv);
    out << csv.str();
  }
  if (count) std::fprintf(stderr, "mean kf over %d trees: %.3f\n", count, kf_sum / count);
  return 0;
}
