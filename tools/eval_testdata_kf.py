"""Evaluate a checkpoint on the reference testdata: inference -> BME+NNI+SPR
-> mean KF vs true trees (the README 0.333 pipeline, `README.md:77-99`).

    python tools/eval_testdata_kf.py <ckpt-or-npz> [--cpu] [--json]
"""
import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--msas", default="/root/reference/data/testdata/msas")
    ap.add_argument("--trees", default="/root/reference/data/testdata/trees")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    from pathlib import Path

    from phyloformer_tpu.data.fasta import read_fasta
    from phyloformer_tpu.data.phylip import vec_to_phylip
    from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
    from phyloformer_tpu.io import load_pretrained
    from phyloformer_tpu.trees import native

    params, cfg, meta = load_pretrained(args.weights)
    engine = InferenceEngine(params, cfg, InferenceConfig())
    msas = sorted(Path(args.msas).glob("*.fa"))
    alns = [read_fasta(p) for p in msas]
    preds = engine.predict(alns)
    kfs = []
    for p, aln, vec in zip(msas, alns, preds):
        _, phy = vec_to_phylip(np.asarray(vec, np.float64), aln.ids)
        nwk = native.build_tree_from_phylip(phy, "bme", nni=True, spr=True)
        cmp = native.compare_newick(
            (Path(args.trees) / (p.stem + ".nwk")).read_text(), nwk
        )
        kfs.append(cmp.kf)
    print(json.dumps({
        "weights": args.weights,
        "step": meta.get("step"),
        "mean_kf": float(np.mean(kfs)),
        "median_kf": float(np.median(kfs)),
        "n": len(kfs),
    }))


if __name__ == "__main__":
    sys.exit(main())
