"""Inference CLI — evolutionary distances (and optional NJ trees) from MSAs.

Drop-in surface for the reference CLI
(`/root/reference/infer_alns.py:41-60`):

    pf-infer <weights.ckpt> <alndir> -o <outdir> [--trees]

plus TPU-era extensions: batched bucketed execution, precision control, and a
throughput report.  Accepts both reference PyTorch ``.ckpt`` files and our
Orbax checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from glob import glob
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="pf-infer",
        description="Infer evolutionary distances with Phyloformer-TPU",
    )
    parser.add_argument("weights", help="model checkpoint (.ckpt torch zip or orbax dir)")
    parser.add_argument("alndir", help="directory containing .fa/.fasta alignments")
    parser.add_argument("--outdir", "-o", default=None,
                        help="output directory for .phy distance matrices")
    parser.add_argument("--trees", "-t", action="store_true",
                        help="also write NJ trees (<stem>.nj.nwk)")
    parser.add_argument("--fastme", action="store_true",
                        help="also run the native BME+NNI+SPR search on each "
                             "matrix and write final trees (<stem>.nwk) — the "
                             "full reference pipeline in one command")
    parser.add_argument("--tree-method", default="bme",
                        choices=["bme", "nj", "bionj"],
                        help="construction method for --fastme")
    parser.add_argument("--precision", choices=["float32", "bfloat16"],
                        default="float32", help="parameter/activation dtype")
    parser.add_argument("--matmul-precision",
                        choices=["float32", "tensorfloat32", "default"],
                        default="float32",
                        help="MXU pass mode (float32 = parity; tensorfloat32 "
                             "~3e-5 distance error, faster)")
    parser.add_argument("--pallas", action="store_true",
                        help="use the fused Pallas TPU kernels")
    parser.add_argument("--gelu", choices=["exact", "tanh"], default="exact",
                        help="FFN activation on the pipelined Pallas path: "
                             "exact = reference erf GELU; tanh = the "
                             "measured-fast approximation (+13%% throughput, "
                             "end-metric neutral — docs/performance.md r5)")
    parser.add_argument("--batch-tokens", type=int, default=1 << 22,
                        help="max pair-site tokens per device batch")
    parser.add_argument("--max-batch-size", type=int, default=64)
    parser.add_argument("--no-bucketing", action="store_true",
                        help="run every alignment at its exact shape (recompiles per shape)")
    parser.add_argument("--stats", action="store_true", help="print timing stats JSON")
    parser.add_argument("--multihost", action="store_true",
                        help="shard the alignment list across jax processes "
                             "(call with jax.distributed initialized; each "
                             "host writes its own shard of outputs)")
    parser.add_argument("--distributed-init", action="store_true",
                        help="call jax.distributed.initialize() first")
    parser.add_argument("--mesh-data", type=int, default=None,
                        help="run over a ('data','pair') device mesh: data-"
                             "axis size (default: all devices / --mesh-pair)")
    parser.add_argument("--mesh-pair", type=int, default=1,
                        help="pair-axis mesh size — shards the quadratic "
                             "pair activation axis across chips for "
                             "alignments beyond one chip's HBM")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..data.fasta import has_fasta_ext, read_fasta
    from ..data.phylip import vec_to_phylip
    from ..infer.engine import InferenceConfig, InferenceEngine
    from ..io.ckpt_import import load_pretrained

    in_dir = os.path.abspath(args.alndir)
    out_dir = os.path.abspath(args.outdir) if args.outdir else os.path.join(in_dir, "predictions")
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.perf_counter()
    params, cfg, _ = load_pretrained(args.weights)
    load_s = time.perf_counter() - t0

    if args.distributed_init:
        import jax

        jax.distributed.initialize()

    paths = sorted(glob(os.path.join(in_dir, "*")))
    paths = [p for p in paths if os.path.isfile(p)]
    for p in paths:
        if not has_fasta_ext(p):
            raise ValueError(
                f"Input files must be fasta files (.fa or .fasta). Got {p}"
            )
    if not paths:
        print(f"no alignments found in {in_dir}", file=sys.stderr)
        return 1

    if args.multihost:
        from ..parallel.mesh import host_local_slice

        start, stop = host_local_slice(len(paths))
        paths = paths[start:stop]
        if not paths:
            return 0

    alns, skipped = [], []
    kept_paths = []
    for p in paths:
        try:
            alns.append(read_fasta(p))
            kept_paths.append(p)
        except ValueError as e:
            # name the offending file, keep going with the rest (the
            # reference dies mid-directory with a bare traceback here)
            skipped.append(p)
            print(f"pf-infer: skipping {p}: {e}", file=sys.stderr)
    paths = kept_paths
    if not alns:
        print("pf-infer: no readable alignments", file=sys.stderr)
        return 1

    icfg = InferenceConfig(
        max_batch_tokens=args.batch_tokens,
        max_batch_size=args.max_batch_size,
        precision=args.precision,
        matmul_precision=args.matmul_precision,
        use_pallas=args.pallas,
        pipeline_gelu=args.gelu,
    )
    if args.no_bucketing:
        icfg = InferenceConfig(
            n_buckets=(), l_buckets=(), allow_oversize=True,
            max_batch_tokens=args.batch_tokens, precision=args.precision,
            matmul_precision=args.matmul_precision, use_pallas=args.pallas,
            pipeline_gelu=args.gelu,
        )
    if args.mesh_data is not None or args.mesh_pair > 1:
        from ..infer.engine import ShardedInferenceEngine
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, pair=args.mesh_pair)
        print(f"mesh: {dict(mesh.shape)}", file=sys.stderr)
        engine = ShardedInferenceEngine(params, cfg, mesh, icfg)
    else:
        engine = InferenceEngine(params, cfg, icfg)

    t1 = time.perf_counter()
    preds = engine.predict(alns)
    infer_s = time.perf_counter() - t1

    for path, aln, vec in zip(paths, alns, preds):
        stem = Path(path).stem
        dm, phylip = vec_to_phylip(vec, aln.ids)
        with open(os.path.join(out_dir, f"{stem}.phy"), "w") as fh:
            fh.write(phylip)
        if args.trees:
            from ..trees.nj import neighbor_joining

            tree = neighbor_joining(dm.astype(np.float64), aln.ids)
            with open(os.path.join(out_dir, f"{stem}.nj.nwk"), "w") as fh:
                fh.write(tree.to_newick() + "\n")
        if args.fastme:
            from ..trees.native import build_tree

            nwk = build_tree(dm.astype(np.float64), aln.ids,
                             method=args.tree_method, nni=True, spr=True)
            with open(os.path.join(out_dir, f"{stem}.nwk"), "w") as fh:
                fh.write(nwk + "\n")

    if args.stats:
        stats = dict(engine.stats)
        stats.update(
            model_load_s=round(load_s, 4),
            total_infer_s=round(infer_s, 4),
            alignments=len(alns),
            alignments_per_s=round(len(alns) / infer_s, 4) if infer_s else None,
        )
        print(json.dumps(stats))
    if skipped:
        print(
            f"pf-infer: {len(skipped)} unreadable alignment(s) skipped",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
