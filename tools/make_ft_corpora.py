"""Build the fine-tune corpora for the lineage legs (indel + cherry).

Round-5 scale-up of the round-4 indel recipe (docs/performance.md "PF_Indel
lineage leg") plus the new self-consistent cherry leg (VERDICT r4 #4):

- indel train: birth-death trees, tips uniform [10,50], LG+GC+GEO-indel
  alignments at L=250 (`alisim.py:86-89` semantics, native CPU engine),
  packed for pf-train.
- cherry train: same tree prior, CherryML-style paired-LG coevolution MSAs
  (`simcherry.sh:23-38` semantics via sim/gillespie.py), packed.
- held-out 30-tree test sets (20 tips, fresh seeds) per regime, with true
  trees kept for KF scoring.

    python tools/make_ft_corpora.py data/ft [--indel-n 6000] [--cherry-n 4000]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

TIPS_RANGE = range(10, 51)


def sim_trees(outdir: Path, total: int, seed: int, tips=None) -> None:
    from phyloformer_tpu.sim.trees import TreeSimConfig, simulate_trees

    if tips is not None:
        simulate_trees(outdir, total, TreeSimConfig(ntips=tips), seed=seed)
        return
    per = total // len(TIPS_RANGE)
    extra = total - per * len(TIPS_RANGE)
    for j, ntips in enumerate(TIPS_RANGE):
        simulate_trees(outdir, per + (1 if j < extra else 0),
                       TreeSimConfig(ntips=ntips), seed=seed + ntips)


def run(cmd, label):
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m"] + cmd, capture_output=True, text=True)
    tail = r.stderr.strip().splitlines()[-1] if r.stderr.strip() else r.stdout.strip()
    print(f"[{label}] rc={r.returncode} {tail!r} in {time.time()-t0:.0f}s",
          flush=True)
    if r.returncode not in (0, 1):
        print(r.stderr[-1500:], file=sys.stderr)
        raise SystemExit(r.returncode)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--indel-n", type=int, default=6000)
    ap.add_argument("--cherry-n", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=515000)
    args = ap.parse_args(argv)
    out = Path(args.outdir)

    # --- indel train ---
    tdir = out / "indel/trees"
    if not (out / "indel/packed/manifest.json").exists():
        print(f"[indel] {args.indel_n} trees", flush=True)
        sim_trees(tdir, args.indel_n, args.seed + 1)
        run(["phyloformer_tpu.sim.cli_msa", str(tdir), str(out / "indel/msas"),
             "-l", "250", "-s", "LG", "-g", "GC", "--indels",
             "--seed", str(args.seed + 2)], "indel-msas")
        run(["phyloformer_tpu.train.cli_preprocess", "-t", str(tdir),
             "-a", str(out / "indel/msas"), "-o", str(out / "indel/packed")],
            "indel-pack")

    # --- indel test (held-out, 20 tips like the round-4 set) ---
    ttest = out / "indel_test/trees"
    if not ttest.exists():
        sim_trees(ttest, 30, args.seed + 3, tips=20)
        run(["phyloformer_tpu.sim.cli_msa", str(ttest),
             str(out / "indel_test/msas"), "-l", "250", "-s", "LG", "-g", "GC",
             "--indels", "--seed", str(args.seed + 4)], "indel-test")

    # --- cherry train ---
    tdir = out / "cherry/trees"
    if not (out / "cherry/packed/manifest.json").exists():
        print(f"[cherry] {args.cherry_n} trees", flush=True)
        sim_trees(tdir, args.cherry_n, args.seed + 5)
        run(["phyloformer_tpu.sim.cli_coevolution", str(tdir),
             str(out / "cherry/msas"), "--seqlen", "250",
             "--seed", str(args.seed + 6)], "cherry-msas")
        run(["phyloformer_tpu.train.cli_preprocess", "-t", str(tdir),
             "-a", str(out / "cherry/msas"), "-o", str(out / "cherry/packed")],
            "cherry-pack")

    # --- cherry test ---
    ttest = out / "cherry_test/trees"
    if not ttest.exists():
        sim_trees(ttest, 30, args.seed + 7, tips=20)
        run(["phyloformer_tpu.sim.cli_coevolution", str(ttest),
             str(out / "cherry_test/msas"), "--seqlen", "250",
             "--seed", str(args.seed + 8)], "cherry-test")

    print("done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
