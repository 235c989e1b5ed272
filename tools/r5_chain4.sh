#!/bin/bash
# Round-5 chip chain 4: L250-only MRE fine-tune from the r5 scratch base.
# Round-4 showed mixed-length MRE trades away some of the 250-AA testdata
# metric (the 0.333 north-star benchmark is 250 AA); round-3's all-250 MRE
# leg is the recipe that reached 0.3311 from the published base.  This leg
# runs the same recipe from OUR base on the L250 slice of the r5 corpus.
set -u
cd /root/repo

echo "[mre250_r5] $(date)"
timeout 7200 python -m phyloformer_tpu.train.cli \
  --packed-data data/corpus_r5/packed_L250 --packed-val-fraction 0.02 \
  --loss mre --batch-size 8 --max-batch-tokens 2000000 \
  --matmul-precision default --base-model artifacts/pf_scratch_r5.ckpt \
  --learning-rate 1e-4 --warmup-steps 800 --max-steps 8000 \
  --check-val-every 1000 --no-improvement-stop 100 --log-every 200 \
  --output-dir runs/mre250_r5 --run-name mre250_r5 --seed 91
echo "[mre250_r5 train done] rc=$? $(date)"

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python tools/eval_curve.py runs/mre250_r5/checkpoints_mre250_r5 \
    --out docs/mre250_r5_kf_curve.jsonl
echo "[mre250_r5 curve done] rc=$? $(date)"
