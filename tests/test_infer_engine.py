"""Inference-engine integration tests: bucketing, batching, masking, CLI."""

import json
import subprocess
import sys

import numpy as np
import pytest

from phyloformer_tpu.data import read_fasta, read_phylip
from phyloformer_tpu.infer.engine import (
    InferenceConfig,
    InferenceEngine,
    real_pair_selector,
)
from phyloformer_tpu.io import load_pretrained

CKPT = "/root/reference/models/pf.ckpt"


def test_real_pair_selector():
    # pad 4 -> real 3: pairs of pad-4 enum: (0,1)(0,2)(0,3)(1,2)(1,3)(2,3)
    sel = real_pair_selector(4, 3)
    assert sel.tolist() == [0, 1, 3]


@pytest.fixture(scope="module")
def engine():
    params, cfg, _ = load_pretrained(CKPT)
    return InferenceEngine(params, cfg)


def test_batched_bucketed_inference_matches_reference(engine, goldens_dir, testdata_dir):
    """All 20 testdata MSAs through the batched padded path vs torch goldens.

    This exercises buckets (20/30/40/50 -> padded n, L=250 -> 256), masks,
    and multi-sample batches at once.
    """
    g = np.load(goldens_dir / "pf_preds_testdata.npz")
    paths = sorted((testdata_dir / "msas").glob("*.fa"))
    alns = [read_fasta(p) for p in paths]
    preds = engine.predict(alns)
    for path, vec in zip(paths, preds):
        want = g[path.stem]
        assert vec.shape == want.shape
        err = np.abs(vec - want).max()
        assert err < 1e-3, f"{path.stem}: max err {err} via batched path"


def test_engine_batch_plan_groups_by_bucket(engine, testdata_dir):
    paths = sorted((testdata_dir / "msas").glob("*.fa"))
    alns = [read_fasta(p) for p in paths]
    plan = engine._plan(alns)
    shapes = {shape for shape, _ in plan}
    # 20/30/40/50 tips with default buckets, L=250 -> 256
    assert shapes == {(20, 256), (30, 256), (40, 256), (50, 256)}
    # all 20 alignments covered exactly once
    covered = sorted(i for _, idxs in plan for i in idxs)
    assert covered == list(range(20))


def test_cli_end_to_end(tmp_path, testdata_dir, goldens_dir):
    """Drive the real CLI surface on a subset of testdata."""
    msas = tmp_path / "msas"
    msas.mkdir()
    for name in ["0_20_tips.fa", "1_20_tips.fa", "0_30_tips.fa"]:
        (msas / name).write_bytes((testdata_dir / "msas" / name).read_bytes())
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, "-m", "phyloformer_tpu.infer.cli", CKPT, str(msas),
         "-o", str(out), "--trees", "--fastme", "--stats"],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["alignments"] == 3

    g = np.load(goldens_dir / "pf_preds_testdata.npz")
    mat, ids = read_phylip(out / "0_20_tips.phy")
    aln = read_fasta(testdata_dir / "msas" / "0_20_tips.fa")
    assert ids == aln.ids
    from phyloformer_tpu.data import square_to_vector

    np.testing.assert_allclose(square_to_vector(mat), g["0_20_tips"], atol=1e-3)

    # NJ tree exists, parses, and has the right taxa
    from phyloformer_tpu.data import read_newick

    tree = read_newick(out / "0_20_tips.nj.nwk")
    assert sorted(tree.leaf_names()) == sorted(aln.ids)

    # --fastme: the one-command pipeline writes final BME+NNI+SPR trees
    tree2 = read_newick(out / "0_20_tips.nwk")
    assert sorted(tree2.leaf_names()) == sorted(aln.ids)


def test_cli_rejects_non_fasta(tmp_path):
    bad = tmp_path / "alns"
    bad.mkdir()
    (bad / "x.txt").write_text("not fasta")
    res = subprocess.run(
        [sys.executable, "-m", "phyloformer_tpu.infer.cli", CKPT, str(bad)],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode != 0
    assert "fasta" in (res.stderr + res.stdout).lower()


def test_sharded_engine_matches_unsharded(testdata_dir):
    """Pair-axis + data-axis sharded inference == single-device inference."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from phyloformer_tpu.infer.engine import ShardedInferenceEngine
    from phyloformer_tpu.parallel import make_mesh

    params, cfg, _ = load_pretrained(CKPT)
    alns = [read_fasta(testdata_dir / "msas" / f"{i}_20_tips.fa") for i in range(3)]

    base = InferenceEngine(params, cfg).predict(alns)
    mesh = make_mesh(data=2, pair=4)
    sharded = ShardedInferenceEngine(params, cfg, mesh).predict(alns)
    for a, b in zip(base, sharded):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_oversize_alignment_exact_shape_fallback():
    """n beyond the largest bucket runs at its exact shape (the reference
    caps at n=200 via the precomputed seq2pair; we don't)."""
    from phyloformer_tpu.infer.engine import InferenceConfig, _bucketize

    assert _bucketize(250, (10, 20, 50), True) == 250
    with pytest.raises(ValueError):
        _bucketize(250, (10, 20, 50), False)


def test_engine_no_bucketing_mode(testdata_dir):
    params, cfg, _ = load_pretrained(CKPT)
    icfg = InferenceConfig(n_buckets=(), l_buckets=(), allow_oversize=True)
    eng = InferenceEngine(params, cfg, icfg)
    aln = read_fasta(testdata_dir / "msas" / "0_20_tips.fa")
    plan = eng._plan([aln])
    assert plan[0][0] == (20, 250)  # exact shape
    vec = eng.predict([aln])[0]
    assert vec.shape == (190,)
