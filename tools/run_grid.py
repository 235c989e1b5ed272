"""Run the reference's benchmark grid for real (VERDICT r2 item #3).

The reference's L5 layer turns pipeline runs over a lengths x tips grid into
the paper CSVs/figures (`/root/reference/make_plots.py:98,230`); until now our
`bench/` collectors were exercised only on synthetic CSVs.  This tool runs the
actual methods over actually-simulated data:

  PF*               our inference engine (accelerator) -> .phy -> native
                    BME+NNI+SPR trees  (any checkpoint; marker = --pf-marker)
  Hamming_FastME    poisson-corrected Hamming distances -> native builder
  ML_FastME         pairwise ML distances under LG -> native builder
  ml_refine         our FastTree-class approximate ML (NNI+SPR+CAT), seeded
                    from Hamming_FastME; tips-capped (python hill climb)
  FastTree          the reference's vendored binary (external baseline, the
                    same role it plays in `make_plots.py:26-39`)

Inputs: --grid-root with  L<length>/{trees,msas}/  per length (stems match).
Outputs per length under --out/L<length>/:
  matrices_<marker>/*.phy   trees_<marker>/*.nwk
  execution_<marker>.csv    (timer,marker,id,elapsed_sec,MaxRSS_kb)
  topos_<marker>.csv        (marker,id,norm_rf,kf_score,weighted_rf)
  dists_<marker>.csv        (marker,id,ref_dist,cmp_dist)
plus a consolidated  --out/grid_metrics.csv  (marker,length,tips rows).

Method processes are independent: run PF on the TPU, then the CPU baselines
under JAX_PLATFORMS=cpu in parallel with training.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np


def _tips_of(stem: str) -> int:
    # naming pattern "{rep}_{tips}_tips" (simulate_trees.py:77 semantics)
    try:
        return int(stem.split("_")[1])
    except (IndexError, ValueError):
        return -1


def run_method(method, length_dir, out_dir, args, rec):
    """Build one tree per MSA with `method`; write matrices (if any) + trees."""
    from phyloformer_tpu.data.fasta import read_fasta
    from phyloformer_tpu.data.phylip import matrix_to_phylip, vec_to_phylip
    from phyloformer_tpu.trees import baselines
    from phyloformer_tpu.trees.native import build_tree_from_phylip

    msas = sorted((length_dir / "msas").glob("*.fa"))
    msas = [p for p in msas if _tips_of(p.stem) <= args.max_tips.get(method, 10**9)]
    skipped = [p.stem for p in sorted((length_dir / "msas").glob("*.fa"))
               if p not in msas]
    if skipped:
        print(f"[{method}] tips cap {args.max_tips.get(method)}: "
              f"skipping {len(skipped)} MSAs: {', '.join(skipped)}", file=sys.stderr)

    mat_dir = out_dir / f"matrices_{method.lower()}"
    tree_dir = out_dir / f"trees_{method.lower()}"
    mat_dir.mkdir(parents=True, exist_ok=True)
    tree_dir.mkdir(parents=True, exist_ok=True)

    if method.startswith("PF"):
        import jax

        from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
        from phyloformer_tpu.io import load_pretrained

        with rec.stage("model_load", method, "all"):
            params, cfg, _ = load_pretrained(args.pf_weights)
            # the benched fast path (fused pipeline kernels + tf32 MXU) on
            # accelerators; fp32 XLA on CPU (interpret-mode kernels would
            # dominate the timing and measure nothing)
            on_tpu = jax.default_backend() == "tpu"
            engine = InferenceEngine(params, cfg, InferenceConfig(
                matmul_precision="tensorfloat32" if on_tpu else "float32",
                use_pallas=on_tpu, max_batch_tokens=1 << 22))
        alns = [read_fasta(p) for p in msas]
        # jit compiles once per (bucket, batch) shape; a full untimed pass
        # separates compile cost from the reported inference timing (the
        # round-3 grid's PF numbers were cold-compile-dominated)
        with rec.stage("compile_warmup", method, "all"):
            engine.predict(alns)
        with rec.stage("inference", method, "all"):
            preds = engine.predict(alns)
        for p, aln, vec in zip(msas, alns, preds):
            _, phy = vec_to_phylip(np.asarray(vec, np.float64), aln.ids)
            (mat_dir / f"{p.stem}.phy").write_text(phy)
            with rec.stage("fastme", method, p.stem):
                nwk = build_tree_from_phylip(phy, "bme", nni=True, spr=True)
            (tree_dir / f"{p.stem}.nwk").write_text(nwk + "\n")
        return

    for p in msas:
        aln = read_fasta(p)
        if method == "Hamming_FastME":
            with rec.stage("distances", method, p.stem):
                mat = baselines.hamming_distance_matrix(aln, correction="poisson")
        elif method == "ML_FastME":
            with rec.stage("distances", method, p.stem):
                mat = baselines.ml_pairwise_distances(aln)
        elif method == "ml_refine":
            # start-tree build INSIDE the timed stage (round 5): the
            # FastTree binary's timing includes its own NJ start, so ours
            # must include the distance+FastME start for a fair wall clock
            with rec.stage("ml_refine", method, p.stem):
                if args.ml_refine_start == "ml":
                    # per-pair ML distances under LG: a better-metric start
                    # than poisson-Hamming (grid v2: ML_FastME nRF beats
                    # Hamming_FastME at every length) for the same builder
                    start = baselines.ml_fastme_tree(aln)
                else:
                    start = baselines.hamming_fastme_tree(aln)
                nwk, _ = baselines.ml_refine(
                    aln, start, spr=True, cat_categories=16,
                    max_sweeps=args.ml_refine_sweeps,
                    spr_radius=args.ml_refine_radius,
                )
            (tree_dir / f"{p.stem}.nwk").write_text(nwk + "\n")
            continue
        elif method == "FastTree":
            with rec.stage("fasttree", method, p.stem):
                nwk = baselines.fasttree_adapter(aln)
            (tree_dir / f"{p.stem}.nwk").write_text(nwk + "\n")
            continue
        else:
            raise SystemExit(f"unknown method {method}")
        phy = matrix_to_phylip(mat, aln.ids)
        (mat_dir / f"{p.stem}.phy").write_text(phy)
        with rec.stage("fastme", method, p.stem):
            nwk = build_tree_from_phylip(phy, "bme", nni=True, spr=True)
        (tree_dir / f"{p.stem}.nwk").write_text(nwk + "\n")


def summarize(out_root: Path, lengths, methods) -> None:
    """Aggregate topos/dists CSVs into grid_metrics.csv (per marker x L x tips)."""
    rows = []
    for L in lengths:
        out_dir = out_root / f"L{L}"
        for method in methods:
            topo_csv = out_dir / f"topos_{method.lower()}.csv"
            if not topo_csv.exists():
                continue
            by_tips = defaultdict(lambda: defaultdict(list))
            with open(topo_csv) as fh:
                for r in csv.DictReader(fh):
                    t = _tips_of(r["id"])
                    by_tips[t]["kf"].append(float(r["kf_score"]))
                    by_tips[t]["nrf"].append(float(r["norm_rf"]))
                    by_tips[t]["wrf"].append(float(r["weighted_rf"]))
            dist_err = defaultdict(lambda: defaultdict(list))
            dist_csv = out_dir / f"dists_{method.lower()}.csv"
            if dist_csv.exists():
                with open(dist_csv) as fh:
                    for r in csv.DictReader(fh):
                        t = _tips_of(r["id"])
                        rd, cd = float(r["ref_dist"]), float(r["cmp_dist"])
                        dist_err[t]["ae"].append(abs(cd - rd))
                        if rd > 0:
                            dist_err[t]["re"].append(abs(cd - rd) / rd)
            for t in sorted(by_tips):
                m = by_tips[t]
                row = {
                    "marker": method, "length": L, "tips": t,
                    "n": len(m["kf"]),
                    "mean_kf": np.mean(m["kf"]),
                    "mean_norm_rf": np.mean(m["nrf"]),
                    "mean_wrf": np.mean(m["wrf"]),
                    "dist_mae": np.mean(dist_err[t]["ae"]) if dist_err[t]["ae"] else "",
                    "dist_mre": np.mean(dist_err[t]["re"]) if dist_err[t]["re"] else "",
                }
                rows.append(row)
    if rows:
        with open(out_root / "grid_metrics.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {out_root / 'grid_metrics.csv'} ({len(rows)} rows)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid-root", default="data/grid")
    ap.add_argument("--out", default="bench_results/grid")
    ap.add_argument("--lengths", default="250,500,1000")
    ap.add_argument("--methods", default="PF")
    ap.add_argument("--pf-weights", default="/root/reference/models/pf.ckpt")
    ap.add_argument("--pf-marker", default="PF")
    ap.add_argument("--ml-refine-max-tips", type=int, default=1000,
                    help="cost cap (uncapped by default: the round-4 "
                         "directional-partial engine runs 100 tips in ~1 "
                         "min); skipped MSAs are listed")
    ap.add_argument("--ml-fastme-max-tips", type=int, default=1000)
    ap.add_argument("--ml-refine-sweeps", type=int, default=3)
    ap.add_argument("--ml-refine-radius", type=int, default=3,
                    help="SPR walk radius (round-5 probe: radius 5 returned "
                         "identical trees to radius 3 at ~2x the scan cost "
                         "on 100-tip grid instances — 3 is the default)")
    ap.add_argument("--ml-refine-start", choices=["hamming", "ml"],
                    default="hamming",
                    help="start-tree distances for ml_refine (built inside "
                         "the timed stage)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    lengths = [int(x) for x in args.lengths.split(",")]
    methods = [m if m != "PF" else args.pf_marker
               for m in args.methods.split(",") if m]
    args.max_tips = {"ml_refine": args.ml_refine_max_tips,
                     "ML_FastME": args.ml_fastme_max_tips}

    out_root = Path(args.out)
    if args.summarize_only:
        summarize(out_root, lengths, methods)
        return 0

    from phyloformer_tpu.bench.harness import BenchmarkRecorder
    from phyloformer_tpu.bench.report import (collect_dist_rows,
                                              collect_topo_rows, write_csv)

    for L in lengths:
        length_dir = Path(args.grid_root) / f"L{L}"
        out_dir = out_root / f"L{L}"
        out_dir.mkdir(parents=True, exist_ok=True)
        for method in methods:
            rec = BenchmarkRecorder()
            run_method("PF" if method == args.pf_marker else method,
                       length_dir, out_dir, args, rec)
            # run_method("PF") writes under matrices_pf/trees_pf; rename to
            # the requested marker when it differs.  Unconditional: a stale
            # dst from a previous run must not shadow fresh PF outputs (the
            # topo/dist collectors below read the marker-named dirs).
            if method == args.pf_marker and args.pf_marker != "PF":
                import shutil

                for sub in ("matrices", "trees"):
                    src = out_dir / f"{sub}_pf"
                    dst = out_dir / f"{sub}_{method.lower()}"
                    if src.exists():
                        if dst.exists():
                            shutil.rmtree(dst)
                        src.rename(dst)
            rec.write_csv(out_dir / f"execution_{method.lower()}.csv")
            topo = collect_topo_rows(length_dir / "trees",
                                     out_dir / f"trees_{method.lower()}", method)
            write_csv(out_dir / f"topos_{method.lower()}.csv", topo)
            from phyloformer_tpu.bench.report import collect_brlen_rows

            brlens = collect_brlen_rows(length_dir / "trees",
                                        out_dir / f"trees_{method.lower()}",
                                        method)
            write_csv(out_dir / f"brlens_{method.lower()}.csv", brlens)
            mat_dir = out_dir / f"matrices_{method.lower()}"
            if any(mat_dir.glob("*.phy")):
                dist = collect_dist_rows(length_dir / "trees", mat_dir, method)
                write_csv(out_dir / f"dists_{method.lower()}.csv", dist)
            if topo:
                print(f"L{L} {method}: mean KF "
                      f"{np.mean([r['kf_score'] for r in topo]):.4f} "
                      f"over {len(topo)} trees")
            stages = {f"{m}/{i}": v for (m, i), v in rec.group_elapsed().items()}
            with open(out_dir / f"stages_{method.lower()}.json", "w") as fh:
                json.dump({"length": L, "method": method, "stages": stages}, fh)
    summarize(out_root, lengths, methods)
    return 0


if __name__ == "__main__":
    sys.exit(main())
