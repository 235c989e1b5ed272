"""Malformed-input error paths: every red path must fail with an
actionable message naming the problem (and, for directory CLIs, the file),
not a bare shape error or silent wrong output.  VERDICT r2 item 7."""

import subprocess
import sys

import numpy as np
import pytest

from phyloformer_tpu.data.fasta import read_fasta
from phyloformer_tpu.data.newick import read_newick

REF = "/root/reference"


def run_cli(module, *args, timeout=420, env=None):
    import os

    e = dict(os.environ, JAX_PLATFORMS="cpu")
    e.pop("PALLAS_AXON_POOL_IPS", None)
    if env:
        e.update(env)
    return subprocess.run(
        [sys.executable, "-m", module, *map(str, args)],
        capture_output=True, text=True, timeout=timeout, env=e,
    )


# --- loader-level -----------------------------------------------------------

def test_ragged_fasta_names_lengths(tmp_path):
    p = tmp_path / "rag.fa"
    p.write_text(">A\nARND\n>B\nARN\n")
    with pytest.raises(ValueError, match="lengths differ"):
        read_fasta(p)


def test_truncated_fasta_empty_record(tmp_path):
    p = tmp_path / "t.fa"
    p.write_text(">A\nARND\n>B\n")
    with pytest.raises(ValueError, match="lengths differ"):
        read_fasta(p)


def test_invalid_residue_named(tmp_path):
    p = tmp_path / "bad.fa"
    p.write_text(">A\nAR1D\n>B\nARND\n")
    with pytest.raises(ValueError, match="invalid residue"):
        read_fasta(p)


def test_unbalanced_newick_position(tmp_path):
    p = tmp_path / "bad.nwk"
    p.write_text("((A:0.1,B:0.2):0.3,C:0.4;")
    with pytest.raises(Exception, match="position"):
        read_newick(p)


def test_mismatched_taxa_named(tmp_path):
    from phyloformer_tpu.train.data import load_example

    t = tmp_path / "t.nwk"
    t.write_text("((A:0.1,B:0.2):0.1,(C:0.1,D:0.2):0.1);\n")
    a = tmp_path / "t.fa"
    a.write_text(">A\nARND\n>B\nARND\n>C\nARND\n>E\nARND\n")
    with pytest.raises(Exception, match="'E' not found"):
        load_example(str(t), str(a))


# --- CLI-level --------------------------------------------------------------

def test_pf_infer_skips_bad_file_and_reports(tmp_path):
    """A directory with one unreadable MSA: the good files are still
    processed, the bad one is named on stderr, exit code is 1."""
    msas = tmp_path / "msas"
    msas.mkdir()
    (msas / "bad_4_tips.fa").write_text(">A\nARND\n>B\nARN\n")
    good = (REF + "/data/testdata/msas/0_20_tips.fa")
    (msas / "good_20_tips.fa").write_text(open(good).read())
    r = run_cli("phyloformer_tpu.infer.cli", f"{REF}/models/pf.ckpt",
                msas, "-o", tmp_path / "out")
    assert r.returncode == 1
    assert "bad_4_tips.fa" in r.stderr and "lengths differ" in r.stderr
    assert (tmp_path / "out" / "good_20_tips.phy").exists()
    assert not (tmp_path / "out" / "bad_4_tips.phy").exists()


def test_pf_infer_all_bad_dir(tmp_path):
    msas = tmp_path / "msas"
    msas.mkdir()
    (msas / "bad_4_tips.fa").write_text(">A\nARND\n>B\nARN\n")
    r = run_cli("phyloformer_tpu.infer.cli", f"{REF}/models/pf.ckpt",
                msas, "-o", tmp_path / "out")
    assert r.returncode == 1
    assert "no readable alignments" in r.stderr


def test_pf_tree_truncated_phylip(tmp_path):
    p = tmp_path / "bad.phy"
    p.write_text("3\nA 0 0.5\nB 0.5 0\n")
    r = run_cli("phyloformer_tpu.trees.cli", "fastme", "-i", p)
    assert r.returncode != 0
    assert "truncated" in (r.stderr + r.stdout)


def test_pf_train_no_pairs(tmp_path):
    trees = tmp_path / "trees"
    alns = tmp_path / "msas"
    trees.mkdir(), alns.mkdir()
    (trees / "x_4_tips.nwk").write_text("((A:1,B:1):1,(C:1,D:1):1);\n")
    (alns / "y_4_tips.fa").write_text(">A\nAR\n>B\nAR\n>C\nAR\n>D\nAR\n")
    r = run_cli("phyloformer_tpu.train.cli", "-t", trees, "-a", alns,
                "--max-steps", 1, "-o", tmp_path / "out")
    assert r.returncode != 0
    assert "pair" in (r.stderr + r.stdout).lower()


def test_find_batch_size_surfaces_non_oom_errors():
    """The probe must re-raise non-memory failures instead of reading them
    as 'does not fit' (silent wrong answer)."""
    from phyloformer_tpu.models.params import PhyloformerConfig
    from phyloformer_tpu.train import TrainConfig
    from phyloformer_tpu.train.cli import find_batch_size

    cfg = PhyloformerConfig(n_blocks=1)
    # invalid loss name -> KeyError deep in the probe, NOT an OOM
    tcfg = TrainConfig(loss="definitely-not-a-loss", total_steps=2)
    with pytest.raises(RuntimeError, match="non-memory"):
        find_batch_size(cfg, tcfg, mesh=None, n=6, L=8, start=1, limit=1)


def test_oom_classifier_handles_reworded_messages():
    """A toolchain that rewords its OOM message must still classify as a
    capacity failure (type + 'alloc'/'memory'/'hbm' fallback), while
    unrelated errors from the same exception types must not."""
    from phyloformer_tpu.train.cli import _is_oom_error

    class XlaRuntimeError(Exception):
        pass

    # exact markers (any exception type)
    assert _is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: ..."))
    assert _is_oom_error(ValueError("Ran out of memory during compile"))
    # reworded messages: classified by type + case-insensitive keywords
    assert _is_oom_error(XlaRuntimeError("failed to Allocate 24.1GiB"))
    assert _is_oom_error(XlaRuntimeError("insufficient HBM for program"))
    # same type, non-memory message -> NOT an OOM
    assert not _is_oom_error(XlaRuntimeError("invalid sharding spec"))
    # memory-ish words on an arbitrary exception type -> NOT an OOM
    assert not _is_oom_error(KeyError("memory_layout"))


def test_pallas_bwd_tile_env_validation(monkeypatch):
    """PF_PALLAS_BWD_PT_C/E must reject malformed or non-power-of-two
    values with a clear message instead of a bare ValueError / silent
    grid misalignment (ADVICE r3)."""
    import numpy as np

    import jax

    from phyloformer_tpu.models.params import init_params, PhyloformerConfig
    from phyloformer_tpu.ops.pallas.axial_block_bwd import fused_axial_block_bwd

    cfg = PhyloformerConfig(n_blocks=1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    layer = params["layers"][0]
    b, p, l, d = 1, 4, 8, cfg.embed_dim
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, p, l, d)).astype(np.float32)
    stats = rng.normal(size=(b, l, 3 * d)).astype(np.float32)
    smask = np.ones((b, l), bool)
    pmask = np.ones((b, p), bool)

    for bad in ("banana", "12"):
        monkeypatch.setenv("PF_PALLAS_BWD_PT_C", bad)
        with pytest.raises(ValueError, match="PF_PALLAS_BWD_PT_C"):
            fused_axial_block_bwd(x, x, stats, x, layer, smask, pmask,
                                  interpret=True)
    monkeypatch.delenv("PF_PALLAS_BWD_PT_C", raising=False)
