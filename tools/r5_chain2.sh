#!/bin/bash
# Round-5 chip chain 2: lineage legs from the round-5 scratch base.
#   MRE fine-tune (published lineage base->PF, README.md:67-72) 10k steps,
#   cherry leg (simcherry.sh coevolution regime) 5k steps,
#   indel leg (alisim.py:86-89 regime) 6k steps.
# KF curves run on CPU in background (74 s/ckpt measured; engine is
# CPU-feasible at 20-30 MSAs) so the chip moves straight to the next leg.
# Usage: bash tools/r5_chain2.sh BASE_CKPT (our scratch .ckpt export)
set -u
cd /root/repo
BASE=${1:?usage: r5_chain2.sh BASE_CKPT}

run_leg () {  # name loss packed steps eval_msas eval_trees
  local name=$1 loss=$2 packed=$3 steps=$4 eval_msas=$5 eval_trees=$6
  echo "[$name] $(date)"
  timeout 7200 python -m phyloformer_tpu.train.cli \
    --packed-data "$packed" --packed-val-fraction 0.02 \
    --loss "$loss" --batch-size 8 --max-batch-tokens 2000000 \
    --matmul-precision default --base-model "$BASE" \
    --learning-rate 1e-4 --warmup-steps 800 --max-steps "$steps" \
    --check-val-every 1500 --no-improvement-stop 100 --log-every 200 \
    --output-dir "runs/$name" --run-name "$name" --seed 90
  echo "[$name train done] rc=$? $(date)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    nohup nice -n 10 python tools/eval_curve.py "runs/$name/checkpoints_$name" \
      --msas "$eval_msas" --trees "$eval_trees" \
      --out "docs/${name}_kf_curve.jsonl" \
      > "data/${name}_curve.log" 2>&1 &
  echo "[$name curve started on CPU, pid $!] $(date)"
}

TD=/root/reference/data/testdata
run_leg mre_r5 mre data/corpus_r5/packed_all 10000 "$TD/msas" "$TD/trees"
run_leg cherry_r5 mae data/ft/cherry/packed 5000 \
  data/ft/cherry_test/msas data/ft/cherry_test/trees
run_leg indel_r5 mae data/ft/indel/packed 6000 \
  data/ft/indel_test/msas data/ft/indel_test/trees
wait
echo "[chain2 done incl. curves] $(date)"
