"""Report/benchmark-harness tests on golden-derived artifacts."""

import numpy as np
import pytest

from phyloformer_tpu.data import vec_to_phylip

native = pytest.importorskip("phyloformer_tpu.trees.native")

try:
    native.build_native()
    HAVE_NATIVE = True
except native.NativeUnavailable:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native toolkit not buildable")


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory, goldens_dir, testdata_dir):
    """Matrices + trees built from golden predictions for a 6-MSA subset."""
    base = tmp_path_factory.mktemp("artifacts")
    mats, trees = base / "mats", base / "trees"
    mats.mkdir(), trees.mkdir()
    g = np.load(goldens_dir / "pf_preds_testdata.npz")
    stems = ["0_20_tips", "1_20_tips", "0_30_tips", "1_30_tips", "0_40_tips", "0_50_tips"]
    for stem in stems:
        ids = [str(x) for x in g[stem + "__ids"]]
        _, phy = vec_to_phylip(g[stem].astype(np.float64), ids)
        (mats / f"{stem}.phy").write_text(phy)
        nwk = native.build_tree_from_phylip(phy, "bme", True, True)
        (trees / f"{stem}.nwk").write_text(nwk + "\n")
    return mats, trees


def test_full_report(artifacts, testdata_dir, tmp_path):
    from phyloformer_tpu.bench.report import full_report

    mats, trees = artifacts
    summary = full_report(
        testdata_dir / "trees", mats, trees, tmp_path / "report", marker="PF"
    )
    assert summary["topo"]["n_trees"] == 6
    assert 0.0 < summary["topo"]["mean_kf"] < 1.0
    assert summary["dist"]["n_pairs"] > 1000
    assert summary["dist"]["mae"] < 0.5
    # csv schemas
    topo_csv = (tmp_path / "report" / "topos_pf.csv").read_text().splitlines()
    assert topo_csv[0] == "marker,id,norm_rf,kf_score,weighted_rf"
    dists_csv = (tmp_path / "report" / "dists_pf.csv").read_text().splitlines()
    assert dists_csv[0] == "marker,id,ref_dist,cmp_dist"
    brlens_csv = (tmp_path / "report" / "brlens_pf.csv").read_text().splitlines()
    assert brlens_csv[0] == "marker,id,ref_len,cmp_len"


def test_benchmark_recorder_schema(tmp_path):
    from phyloformer_tpu.bench.harness import BenchmarkRecorder

    rec = BenchmarkRecorder()
    with rec.stage("inference", "PF", "all"):
        pass
    with rec.stage("fastme", "PF", "0_20_tips"):
        pass
    rec.write_csv(tmp_path / "exec.csv")
    lines = (tmp_path / "exec.csv").read_text().splitlines()
    assert lines[0] == "timer,marker,id,elapsed_sec,MaxRSS_kb"
    assert len(lines) == 3
    grouped = rec.group_elapsed()
    assert ("PF", "all") in grouped and ("PF", "0_20_tips") in grouped


def test_figure_families_and_cli(tmp_path):
    """All make_plots.py figure families render from schema-exact CSVs,
    including the paper-scale id convention ``rep_tips_tips_length``
    (`/root/reference/make_plots.py:187-188`) driving the per-length grids
    and the hist grid, via the `pf-bench figures` subcommand."""
    import csv as _csv

    from phyloformer_tpu.bench.cli import main as bench_main

    rng = np.random.default_rng(0)
    topos = tmp_path / "topos_all.csv"
    with open(topos, "w", newline="") as fh:
        w = _csv.DictWriter(
            fh, fieldnames=["marker", "id", "norm_rf", "kf_score", "weighted_rf"]
        )
        w.writeheader()
        for marker in ["PF", "PF_Base", "FastME"]:
            for rep in range(3):
                for tips in [20, 50]:
                    for length in [250, 500]:
                        w.writerow({
                            "marker": marker,
                            "id": f"{rep}_{tips}_tips_{length}",
                            "norm_rf": rng.random(),
                            "kf_score": rng.random(),
                            "weighted_rf": rng.random() * 3,
                        })
    dists = tmp_path / "dists_all.csv"
    with open(dists, "w", newline="") as fh:
        w = _csv.DictWriter(fh, fieldnames=["marker", "id", "ref_dist", "cmp_dist"])
        w.writeheader()
        for marker in ["PF", "Hamming+FastME"]:
            for rep in range(2):
                for tips in [20, 50]:
                    for _ in range(30):
                        r = rng.random() * 2
                        w.writerow({
                            "marker": marker,
                            "id": f"{rep}_{tips}_tips_250",
                            "ref_dist": r,
                            "cmp_dist": r + rng.normal(0, 0.1),
                        })
    brlens = tmp_path / "brlens_all.csv"
    with open(brlens, "w", newline="") as fh:
        w = _csv.DictWriter(fh, fieldnames=["marker", "id", "ref_len", "cmp_len"])
        w.writeheader()
        for _ in range(50):
            r = rng.random()
            w.writerow({"marker": "PF", "id": "0_20_tips", "ref_len": r,
                        "cmp_len": r + rng.normal(0, 0.02)})

    out = tmp_path / "figs"
    rc = bench_main([
        "figures", "-o", str(out),
        "--topos", str(topos),
        "--dists", str(dists),
        "--brlens", str(brlens),
        "--datasets", f"gaps={topos}", f"cherry={topos}",
    ])
    assert rc == 0
    for name in [
        "topo_norm_rf.pdf", "lines_norm_rf.pdf", "lines_kf_score.pdf",
        "dists_all_errors.pdf", "dist_hist_grid.pdf",
        "brlens_all_scatter.pdf", "finetuned_panels.pdf",
    ]:
        assert (out / name).exists() and (out / name).stat().st_size > 0, name


def test_reference_figure_manifest_renders_all(tmp_path):
    """Every figure file the reference's make_plots.py emits (43 names,
    `/root/reference/make_plots.py:1454-2023`) must render from our CSV
    schemas via the manifest."""
    import csv as _csv

    import numpy as np

    from phyloformer_tpu.bench.manifest import REFERENCE_FIGURES, render_all

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    markers = ["PF+FastME", "PF_Base+FastME", "FastTree", "IQTree_LG+GC"]
    ft = {"gaps": "PF_Indel+FastME", "cherry": "PF_Cherry+FastME",
          "pastek": "PF_SelReg+FastME"}
    for ds in ("lggc", "cherry", "pastek", "gaps"):
        ms = markers + ([ft[ds]] if ds in ft else [])
        with open(data / f"topos_{ds}.csv", "w", newline="") as fh:
            w = _csv.DictWriter(fh, fieldnames=[
                "marker", "id", "norm_rf", "kf_score", "weighted_rf"])
            w.writeheader()
            for marker in ms:
                for rep in range(3):
                    for tips in (10, 50):
                        for length in (250, 500, 1000):
                            w.writerow({
                                "marker": marker,
                                "id": f"{rep}_{tips}_tips_{length}",
                                "norm_rf": rng.random(),
                                "kf_score": rng.random(),
                                "weighted_rf": rng.random() * 3,
                            })
        with open(data / f"dists_{ds}.csv", "w", newline="") as fh:
            w = _csv.DictWriter(fh, fieldnames=[
                "marker", "id", "ref_dist", "cmp_dist"])
            w.writeheader()
            for marker in ms:
                for rep in range(3):
                    for tips in (10, 50):
                        for length in (250, 500, 1000):
                            for _ in range(10):
                                r = rng.lognormal(-1, 1)
                                w.writerow({
                                    "marker": marker,
                                    "id": f"{rep}_{tips}_tips_{length}",
                                    "ref_dist": r,
                                    "cmp_dist": abs(r + rng.normal(0, 0.1)),
                                })
        with open(data / f"execution_{ds}.csv", "w", newline="") as fh:
            w = _csv.writer(fh)
            w.writerow(["timer", "marker", "id", "elapsed_sec", "MaxRSS_kb"])
            for marker in ms:
                for rep in range(3):
                    for tips in (10, 50):
                        for stage in ("inference", "fastme"):
                            w.writerow([stage, marker,
                                        f"{rep}_{tips}_tips_500",
                                        rng.random() + 0.01,
                                        int(rng.integers(1e4, 1e6))])
    with open(data / "likelihoods_lggc.csv", "w", newline="") as fh:
        w = _csv.DictWriter(fh, fieldnames=["marker", "id", "ratio"])
        w.writeheader()
        for marker in markers:
            for rep in range(3):
                for tips in (10, 50):
                    for length in (250, 500, 1000):
                        w.writerow({"marker": marker,
                                    "id": f"{rep}_{tips}_tips_{length}",
                                    "ratio": 1 + rng.normal(0, 0.02)})
    with open(data / "brlens_lggc.csv", "w", newline="") as fh:
        w = _csv.DictWriter(fh, fieldnames=["marker", "id", "ref_len", "cmp_len"])
        w.writeheader()
        for _ in range(60):
            r = rng.random()
            kind = rng.integers(0, 3)
            w.writerow({
                "marker": "PF+FastME", "id": "0_50_tips_500",
                "ref_len": "" if kind == 2 else r,
                "cmp_len": "" if kind == 1 else r + rng.normal(0, 0.02),
            })
    (data / "model_load_times.txt").write_text("1.5\n2.5\n")

    out = tmp_path / "figs"
    rendered = render_all(data, out)
    missing = [name for name in REFERENCE_FIGURES
               if rendered.get(name) is None
               or not (out / name).exists()
               or (out / name).stat().st_size == 0]
    assert not missing, f"unrendered reference figures: {missing}"
