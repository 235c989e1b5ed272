"""Fused-path accuracy by (n, L) + KF-neutrality at large n/L.

VERDICT r1 flagged that the bench accuracy gate (6e-3) was calibrated only
at 20-50 tips x 250 AA.  This measures the fused kernels' drift across the
reference benchmark grid corners (tips up to the reference's 200 cap,
lengths up to 1000) and re-checks the end metric (KF after FastME
--nni --spr) at 100 tips x 1000 sites.

fp32 oracle: the XLA float32 path where it fits; at (200, 1000) the XLA
path's materialized activations exceed HBM, so the oracle is the fused
HIGHEST-precision path (measured within 5.3e-5 of XLA fp32 — see
docs/performance.md round-2 notes).
"""

import json

import numpy as np

from phyloformer_tpu.bench.accuracy import DEFAULT_GRID, drift_grid, make_engines
from phyloformer_tpu.io import load_pretrained

GRID = list(DEFAULT_GRID)


def engines(params, cfg, n, l):
    return make_engines(params, cfg, n, l)


def main():
    # drift grid is now a first-class command: `pf-bench accuracy-grid`
    # (phyloformer_tpu/bench/accuracy.py); this tool adds the KF-neutrality
    # end-metric check on top.
    params, cfg, _ = load_pretrained("/root/reference/models/pf.ckpt")
    for row in drift_grid("/root/reference/models/pf.ckpt", GRID):
        print(json.dumps(row), flush=True)

    # ---- end-metric neutrality at 100 tips x 1000 sites ----
    from phyloformer_tpu.data.newick import patristic_matrix
    from phyloformer_tpu.data.phylip import vec_to_phylip
    from phyloformer_tpu.sim.msa import MsaSimConfig, simulate_msa
    from phyloformer_tpu.sim.trees import (
        TreeSimConfig, diameter_sampler, simulate_tree,
    )
    from phyloformer_tpu.trees.native import build_tree_from_phylip, compare_newick

    import tempfile
    from pathlib import Path

    from phyloformer_tpu.data import read_fasta

    n, l = 100, 1000
    fast, oracle, oracle_name = engines(params, cfg, n, l)
    kf = {"fused": [], "oracle": []}
    tmp = Path(tempfile.mkdtemp(prefix="acc_scale_"))
    for rep in range(4):
        r = np.random.default_rng(100 + rep)
        tree = simulate_tree(r, TreeSimConfig(ntips=n), diameter_sampler(None))
        (tmp / f"{rep}.nwk").write_text(tree.to_newick())
        ok, _ = simulate_msa(tmp / f"{rep}.nwk", tmp / f"{rep}.fa",
                             MsaSimConfig(length=l), rng=r)
        assert ok
        aln = read_fasta(tmp / f"{rep}.fa")
        preds = {
            "fused": fast.predict([aln])[0],
            "oracle": oracle.predict([aln])[0],
        }
        for tag, vec in preds.items():
            _, phy = vec_to_phylip(vec.astype(np.float64), aln.ids)
            nwk = build_tree_from_phylip(phy, "bme", True, True)
            kf[tag].append(compare_newick(tree.to_newick(), nwk).kf)
    summary = {
        "kf_fused_mean": float(np.mean(kf["fused"])),
        "kf_oracle_mean": float(np.mean(kf["oracle"])),
        "oracle": oracle_name,
        "kf_pairs": list(zip(kf["fused"], kf["oracle"])),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
