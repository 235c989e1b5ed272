"""tools/run_grid.py aggregation: per-(marker, length, tips) rows from the
per-method topos/dists CSVs (the consolidated grid_metrics.csv the docs
tables are built from)."""

import csv
import importlib.util
import pathlib

spec = importlib.util.spec_from_file_location(
    "run_grid", pathlib.Path(__file__).parent.parent / "tools" / "run_grid.py")
run_grid = importlib.util.module_from_spec(spec)
spec.loader.exec_module(run_grid)


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)


def test_summarize_aggregates_by_tips(tmp_path):
    out = tmp_path / "L250"
    _write(out / "topos_pf.csv", [
        {"marker": "PF", "id": "0_20_tips", "norm_rf": 0.1,
         "kf_score": 0.3, "weighted_rf": 1.0},
        {"marker": "PF", "id": "1_20_tips", "norm_rf": 0.3,
         "kf_score": 0.5, "weighted_rf": 2.0},
        {"marker": "PF", "id": "0_40_tips", "norm_rf": 0.2,
         "kf_score": 0.7, "weighted_rf": 3.0},
    ])
    _write(out / "dists_pf.csv", [
        {"marker": "PF", "id": "0_20_tips", "ref_dist": 1.0, "cmp_dist": 1.1},
        {"marker": "PF", "id": "1_20_tips", "ref_dist": 2.0, "cmp_dist": 1.8},
    ])
    run_grid.summarize(tmp_path, [250], ["PF"])
    rows = list(csv.DictReader(open(tmp_path / "grid_metrics.csv")))
    assert len(rows) == 2
    t20 = next(r for r in rows if r["tips"] == "20")
    assert abs(float(t20["mean_kf"]) - 0.4) < 1e-12
    assert int(t20["n"]) == 2
    # dist MAE over the two 20-tip pairs: (0.1 + 0.2) / 2
    assert abs(float(t20["dist_mae"]) - 0.15) < 1e-12
    t40 = next(r for r in rows if r["tips"] == "40")
    assert t40["dist_mae"] == ""  # no dist rows for that tips bucket


def test_tips_of_parses_reference_naming():
    assert run_grid._tips_of("3_80_tips") == 80
    assert run_grid._tips_of("weird") == -1
