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
