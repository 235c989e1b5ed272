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
import time

import numpy as np

from phyloformer_tpu.data.fasta import Alignment
from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
from phyloformer_tpu.io import load_pretrained

GRID = [(50, 250), (100, 250), (100, 1000), (200, 250), (200, 1000)]
XLA_FP32_MAX_TOKENS = 100 * 99 // 2 * 1024  # beyond this use fused-HIGHEST


def engines(params, cfg, n, l):
    bucket = dict(n_buckets=(n,), l_buckets=(256 if l <= 250 else 1024,))
    fast = InferenceEngine(params, cfg, InferenceConfig(
        matmul_precision="tensorfloat32", use_pallas=True,
        max_batch_tokens=1 << 23, **bucket))
    pairs_tokens = n * (n - 1) // 2 * (256 if l <= 250 else 1024)
    if pairs_tokens <= XLA_FP32_MAX_TOKENS:
        oracle = InferenceEngine(params, cfg, InferenceConfig(
            matmul_precision="float32", max_batch_tokens=1 << 23, **bucket))
        oracle_name = "xla_fp32"
    else:
        oracle = InferenceEngine(params, cfg, InferenceConfig(
            matmul_precision="float32", use_pallas=True,
            max_batch_tokens=1 << 23, **bucket))
        oracle_name = "fused_highest"
    return fast, oracle, oracle_name


def main():
    params, cfg, _ = load_pretrained("/root/reference/models/pf.ckpt")
    rng = np.random.default_rng(0)
    rows = []
    for n, l in GRID:
        alns = [
            Alignment(codes=rng.integers(0, 20, (n, l)).astype(np.int8),
                      ids=[f"T{j}" for j in range(n)])
            for _ in range(2)
        ]
        fast, oracle, oracle_name = engines(params, cfg, n, l)
        try:
            t0 = time.perf_counter()
            got = fast.predict(alns)
            fast_s = time.perf_counter() - t0
            want = oracle.predict(alns)
        except Exception as err:  # OOM/compile limits at the grid corner
            rows.append({"n": n, "L": l, "oracle": oracle_name,
                         "error": f"{type(err).__name__}: {err}"[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        abs_err = max(float(np.abs(a - b).max()) for a, b in zip(got, want))
        scale = max(float(np.abs(b).max()) for b in want)
        rows.append({"n": n, "L": l, "oracle": oracle_name,
                     "max_abs_err": abs_err, "rel": abs_err / scale,
                     "fused_s_for_2": round(fast_s, 2)})
        print(json.dumps(rows[-1]), flush=True)

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
