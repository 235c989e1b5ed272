"""One-shot mixed-length pretraining-corpus builder (round-4 recipe, re-runnable).

Reproduces the corpus-scale pipeline documented in docs/performance.md
"Round 4: corpus-scale training": birth-death trees with tips uniform in
[10, 50] and hogenom diameter priors (reference `simulate_trees.py:183-209`
semantics via `sim/trees.py`), LG+GC alignments at mixed lengths
{250, 500, 1000} simulated by the batched on-device engine
(`sim/device.py`), packed per length class with pf-preprocess and merged
with tools/merge_packed.py into ONE loader dir.

    python tools/make_corpus.py OUTDIR [--seed 20250821] [--scale 1.0]

Produces OUTDIR/{trees_L*,msas_L*,packed_L*,packed_all}; point pf-train at
OUTDIR/packed_all via --packed-data.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

# round-4 composition (docs/performance.md): {250: ~61%, 500: ~26%, 1000: ~13%}
LENGTH_COUNTS = {250: 63_000, 500: 26_000, 1000: 13_500}
TIPS_RANGE = range(10, 51)


def sim_trees(outdir: Path, total: int, seed: int) -> None:
    from phyloformer_tpu.sim.trees import TreeSimConfig, simulate_trees

    per_tips = total // len(TIPS_RANGE)
    extra = total - per_tips * len(TIPS_RANGE)
    t0 = time.time()
    for j, ntips in enumerate(TIPS_RANGE):
        n = per_tips + (1 if j < extra else 0)
        cfg = TreeSimConfig(ntips=ntips)
        simulate_trees(outdir, n, cfg, seed=seed + ntips)
    print(f"  {total} trees -> {outdir} in {time.time() - t0:.0f}s", flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("outdir")
    p.add_argument("--seed", type=int, default=20250821)
    p.add_argument("--scale", type=float, default=1.0,
                   help="multiply every length-class count")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--skip-trees", action="store_true")
    p.add_argument("--skip-msas", action="store_true")
    args = p.parse_args(argv)

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)

    for L, count in LENGTH_COUNTS.items():
        count = int(count * args.scale)
        tdir, mdir, pdir = out / f"trees_L{L}", out / f"msas_L{L}", out / f"packed_L{L}"
        if not args.skip_trees:
            print(f"[trees] L={L} n={count}", flush=True)
            sim_trees(tdir, count, args.seed + L)
        if not args.skip_msas:
            print(f"[msas] L={L} device engine", flush=True)
            t0 = time.time()
            # subprocess per length class so each device-sim compile gets a
            # fresh process (axon compile cache persists across processes)
            r = subprocess.run(
                [sys.executable, "-m", "phyloformer_tpu.sim.cli_msa",
                 str(tdir), str(mdir), "-l", str(L), "-s", "LG", "-g", "GC",
                 "--engine", "device", "--batch-size", str(args.batch_size),
                 "--seed", str(args.seed + 7 * L)],
                capture_output=True, text=True)
            n_fail = r.stderr.count("\n  (")  # failure list lines
            tail = r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ""
            print(f"  rc={r.returncode} {tail!r} (~{n_fail} failed) "
                  f"in {time.time() - t0:.0f}s", flush=True)
            if r.returncode not in (0, 1):  # 1 = some duplicate-rejections
                print(r.stderr[-2000:], file=sys.stderr)
                return r.returncode
        print(f"[pack] L={L}", flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "phyloformer_tpu.train.cli_preprocess",
             "-t", str(tdir), "-a", str(mdir), "-o", str(pdir)],
            capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            return r.returncode
        print(f"  {r.stdout.strip()}", flush=True)

    merged = out / "packed_all"
    r = subprocess.run(
        [sys.executable, "tools/merge_packed.py", str(merged)]
        + [str(out / f"packed_L{L}") for L in LENGTH_COUNTS],
        capture_output=True, text=True)
    print(r.stdout.strip() or r.stderr.strip(), flush=True)
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
