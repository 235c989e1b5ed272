"""Simulate the grid-v2 input data (one tree set, evolved at each length).

Grid v2 semantics (docs/benchmark_grid.md): ONE tree set of 5 replicates x
{10,20,40,60,80,100} tips, evolved at each L in {250,500,1000} under LG+GC
with the native CPU engine and the reference's duplicate-rejection cap
raised to 60 attempts.  Layout matches tools/run_grid.py --grid-root:
OUT/L<length>/{trees,msas}.

    python tools/make_grid_data.py data/grid_v3 [--seed 31000]
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
import time
from pathlib import Path

TIPS = (10, 20, 40, 60, 80, 100)
LENGTHS = (250, 500, 1000)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--seed", type=int, default=31000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    out = Path(args.outdir)
    tree_master = out / "trees"
    from phyloformer_tpu.sim.trees import TreeSimConfig, simulate_trees

    for t in TIPS:
        simulate_trees(tree_master, args.reps, TreeSimConfig(ntips=t),
                       seed=args.seed + t)
    print(f"simulated {args.reps * len(TIPS)} trees -> {tree_master}", flush=True)

    for L in LENGTHS:
        ldir = out / f"L{L}"
        ltrees = ldir / "trees"
        if ltrees.exists():
            shutil.rmtree(ltrees)
        shutil.copytree(tree_master, ltrees)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "phyloformer_tpu.sim.cli_msa",
             str(ltrees), str(ldir / "msas"), "-l", str(L), "-s", "LG",
             "-g", "GC", "--engine", "native", "--max-attempts", "60",
             "--seed", str(args.seed + 7 * L)],
            capture_output=True, text=True)
        tail = r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ""
        print(f"L{L}: rc={r.returncode} {tail!r} in {time.time()-t0:.0f}s",
              flush=True)
        if r.returncode not in (0, 1):
            print(r.stderr[-2000:], file=sys.stderr)
            return r.returncode
    return 0


if __name__ == "__main__":
    sys.exit(main())
