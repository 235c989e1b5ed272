#!/bin/bash
# Render the grid-v3 figure suite from real run CSVs (VERDICT r4 #8):
# topology boxplots/lines, distance errors, brlens scatter, runtime bars,
# likelihood violins, + consolidated summary CSV. Run on CPU after the PF
# grid legs (chain3) exist.
set -u
cd /root/repo
OUT=runs/grid_v3/out
ML=runs/grid_v3/out_mlstart_r3

# marker-rename the ml-start variant into the main out tree
for L in 250 500 1000; do
  for kind in topos execution brlens; do
    src="$ML/L$L/${kind}_ml_refine.csv"
    [ -f "$src" ] && sed 's/\bml_refine\b/ml_refine_ml/g' "$src" \
      > "$OUT/L$L/${kind}_ml_refine_ml.csv"
  done
done

# likelihood ratios (native Felsenstein; reference likelihoods_* schema)
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - <<'EOF'
from pathlib import Path
from phyloformer_tpu.bench.report import collect_likelihood_rows, write_csv
OUT = Path("runs/grid_v3/out")
for L in (250, 500, 1000):
    ldir = Path(f"data/grid_v3/L{L}")
    for marker in ("pf", "pf_mre_r5", "fasttree", "ml_refine_ml"):
        tdir = OUT / f"L{L}/trees_{marker}"
        if not tdir.is_dir():
            continue
        rows = collect_likelihood_rows(ldir / "msas", ldir / "trees", tdir, marker)
        write_csv(OUT / f"L{L}/likelihoods_{marker}.csv", rows)
        print(f"L{L} {marker}: {len(rows)} likelihood rows", flush=True)
EOF

python tools/summarize_grid.py runs/grid_v3/summary.csv "$OUT"

# per-file figure families (dists/brlens) emit {stem}.pdf — stage copies
# with length-disambiguated stems so L250/L500/L1000 don't overwrite
STAGE=runs/grid_v3/figstage
rm -rf "$STAGE"; mkdir -p "$STAGE"
for L in 250 500 1000; do
  for f in "$OUT/L$L"/dists_*.csv "$OUT/L$L"/brlens_*.csv; do
    [ -f "$f" ] && cp "$f" "$STAGE/L${L}_$(basename "$f")"
  done
done

shopt -s nullglob
python -m phyloformer_tpu.bench.cli figures -o docs/grid \
  --topos "$OUT"/L*/topos_*.csv \
  --dists "$STAGE"/*dists_*.csv \
  --brlens "$STAGE"/*brlens_*.csv \
  --exec "$OUT"/L*/execution_*.csv \
  --likelihoods "$OUT"/L*/likelihoods_*.csv \
  --metrics kf_score norm_rf
echo "[figures done] rc=$?"
ls docs/grid/
