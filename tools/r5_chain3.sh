#!/bin/bash
# Round-5 chip chain 3: PF grid legs over grid v3 — the published pf.ckpt
# next to our round-5 lineage checkpoints (VERDICT r4 #3: evaluate
# our-trained weights at L=500/1000, not just 250).
# Usage: bash tools/r5_chain3.sh [extra marker=ckpt pairs...]
set -u
cd /root/repo

run_pf () {  # marker ckpt
  echo "[grid PF $1] $(date)"
  timeout 4800 python tools/run_grid.py --grid-root data/grid_v3 \
    --out runs/grid_v3/out --methods PF --pf-marker "$1" --pf-weights "$2"
  echo "[grid PF $1 done] rc=$? $(date)"
}

run_pf PF /root/reference/models/pf.ckpt
[ -f artifacts/pf_scratch_r5.ckpt ] && run_pf PF_scratch_r5 artifacts/pf_scratch_r5.ckpt
[ -f artifacts/pf_mre_r5.ckpt ] && run_pf PF_mre_r5 artifacts/pf_mre_r5.ckpt
for spec in "$@"; do
  run_pf "${spec%%=*}" "${spec#*=}"
done
echo "[chain3 done] $(date)"
