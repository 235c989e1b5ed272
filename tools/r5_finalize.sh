#!/bin/bash
# Round-5 finalize: wait for chain2 (lineage legs), export leg checkpoints
# to reference-format artifacts, run the chip grid legs (chain3), then the
# all-first-party misspecification crossmatrix on CPU.
# Usage: bash tools/r5_finalize.sh CHAIN2_LOG
set -u
cd /root/repo
LOG=${1:-data/r5_watch1.log}

while ! grep -q "chain2 done" "$LOG" 2>/dev/null; do sleep 30; done
echo "[chain2 done seen] $(date)"

for leg in mre_r5 cherry_r5 indel_r5; do
  # keep hand-picked (best-step) exports: only export when absent
  if [ -d "runs/$leg/checkpoints_$leg" ] && [ ! -f "artifacts/pf_${leg}.ckpt" ]; then
    python -m phyloformer_tpu.io.cli export "runs/$leg/checkpoints_$leg" \
      "artifacts/pf_${leg}.ckpt" && echo "[exported $leg]"
  fi
done

bash tools/r5_chain3.sh

echo "[crossmatrix] $(date)"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  timeout 3600 python -m phyloformer_tpu.bench.cli crossmatrix \
  --models base=artifacts/pf_scratch_r5.ckpt mre=artifacts/pf_mre_r5.ckpt \
           indel=artifacts/pf_indel_r5.ckpt cherry=artifacts/pf_cherry_r5.ckpt \
  --datasets standard=/root/reference/data/testdata/msas:/root/reference/data/testdata/trees \
             indel=data/ft/indel_test/msas:data/ft/indel_test/trees \
             cherry=data/ft/cherry_test/msas:data/ft/cherry_test/trees \
  -o runs/crossmatrix_r5 --precision float32
echo "[finalize done] rc=$? $(date)"
