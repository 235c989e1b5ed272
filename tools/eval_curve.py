"""KF-on-testdata curve over a training run's orbax checkpoints.

One process, one engine jit cache: parameter SHAPES are identical across
checkpoints, so inference compiles once and each checkpoint evaluation is
seconds instead of minutes.

    python tools/eval_curve.py RUN_CKPT_DIR [--out curve.jsonl]
        [--msas DIR --trees DIR] [--steps 2000,4000,...]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--msas", default="/root/reference/data/testdata/msas")
    ap.add_argument("--trees", default="/root/reference/data/testdata/trees")
    ap.add_argument("--steps", default=None,
                    help="comma-separated checkpoint steps (default: all)")
    args = ap.parse_args()

    from phyloformer_tpu.data.fasta import read_fasta
    from phyloformer_tpu.data.phylip import vec_to_phylip
    from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
    from phyloformer_tpu.trees import native

    ckpt_root = Path(args.ckpt_dir)
    steps = (sorted(int(p.name) for p in ckpt_root.iterdir() if p.name.isdigit())
             if args.steps is None
             else [int(s) for s in args.steps.split(",")])

    msas = sorted(Path(args.msas).glob("*.fa"))
    alns = [read_fasta(p) for p in msas]
    truths = {p.stem: (Path(args.trees) / f"{p.stem}.nwk").read_text()
              for p in msas}

    from phyloformer_tpu.io.checkpoint import CheckpointManager
    from phyloformer_tpu.io.ckpt_import import _infer_config

    mgr = CheckpointManager(ckpt_root)
    engine = None
    rows = []
    for step in steps:
        state, _ = mgr.restore(step=step)
        params = state["params"] if "params" in state else state
        if engine is None:
            meta = mgr.restore_metadata(step=step)
            from phyloformer_tpu.models.params import PhyloformerConfig

            cfg_dict = (meta or {}).get("config", {})
            cfg = (PhyloformerConfig(**cfg_dict) if cfg_dict
                   else _infer_config(params))
            engine = InferenceEngine(params, cfg, InferenceConfig())
        else:
            import jax

            engine.params = jax.device_put(params)  # shapes identical: reuse jit
        preds = engine.predict(alns)
        kfs = []
        for p, aln, vec in zip(msas, alns, preds):
            _, phy = vec_to_phylip(np.asarray(vec, np.float64), aln.ids)
            nwk = native.build_tree_from_phylip(phy, "bme", nni=True, spr=True)
            kfs.append(native.compare_newick(truths[p.stem], nwk).kf)
        row = {"step": step, "mean_kf": float(np.mean(kfs)),
               "n": len(kfs)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        Path(args.out).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


if __name__ == "__main__":
    main()
