// pf-fastme: distance matrix -> tree CLI, drop-in for the reference's
// `fastme -i mat.phy -o tree.nwk --nni --spr` usage (README.md:91).
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>

#include "pftree.h"

int main(int argc, char** argv) {
  std::string input, output, method = "bme";
  bool nni = false, spr = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if ((a == "-i" || a == "--input") && i + 1 < argc) input = argv[++i];
    else if ((a == "-o" || a == "--output") && i + 1 < argc) output = argv[++i];
    else if ((a == "-m" || a == "--method") && i + 1 < argc) method = argv[++i];
    else if (a == "--nni" || a == "-n") nni = true;
    else if (a == "--spr" || a == "-s") spr = true;
    else if (a == "-h" || a == "--help") {
      std::puts("usage: pf-fastme -i matrix.phy [-o tree.nwk] [-m bme|nj] [--nni] [--spr]");
      return 0;
    }
  }
  if (input.empty()) {
    std::fprintf(stderr, "pf-fastme: missing -i matrix.phy\n");
    return 2;
  }
  std::ifstream in(input);
  if (!in) {
    std::fprintf(stderr, "pf-fastme: cannot open %s\n", input.c_str());
    return 2;
  }
  std::stringstream ss;
  ss << in.rdbuf();
  try {
    pftree::DistMatrix dm = pftree::read_phylip(ss.str());
    pftree::Tree t = pftree::build_tree(dm, method, nni, spr);
    std::string nwk = pftree::to_newick(t) + "\n";
    if (output.empty()) {
      std::fputs(nwk.c_str(), stdout);
    } else {
      std::ofstream out(output);
      out << nwk;
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "pf-fastme: %s\n", e.what());
    return 1;
  }
  return 0;
}
