"""End-to-end CLI tests (subprocess, tiny configs, CPU)."""

import json
import subprocess
import sys

import numpy as np
import pytest


def run_cli(module, *args, timeout=420):
    return subprocess.run(
        [sys.executable, "-m", module, *map(str, args)],
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory):
    base = tmp_path_factory.mktemp("cli_ds")
    r = run_cli("phyloformer_tpu.sim.cli_trees", "-n", 6, "-t", 8, "-o",
                base / "trees", "--seed", 3)
    assert r.returncode == 0, r.stderr
    r = run_cli("phyloformer_tpu.sim.cli_msa", base / "trees", base / "msas",
                "-l", 60, "--seed", 3)
    assert r.returncode == 0, r.stderr
    return base


def test_simulator_clis_produce_paired_data(sim_dataset):
    trees = sorted((sim_dataset / "trees").glob("*.nwk"))
    msas = sorted((sim_dataset / "msas").glob("*.fa"))
    assert len(trees) == 6 and len(msas) == 6
    assert [t.stem for t in trees] == [m.stem for m in msas]


def test_train_cli_end_to_end(sim_dataset, tmp_path):
    r = run_cli(
        "phyloformer_tpu.train.cli",
        "-t", sim_dataset / "trees", "-a", sim_dataset / "msas",
        "--nb-blocks", 1, "--embed-dim", 16, "--nb-heads", 2,
        "--batch-size", 2, "--max-steps", 3, "--check-val-every", 2,
        "--log-every", 1, "-o", tmp_path, "--run-name", "cli_smoke",
        "--warmup-steps", 1, "--hard-loss-ceiling", 1e6,
        "--matmul-precision", "default",
    )
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["steps"] >= 3, (summary, r.stdout[-500:])
    metrics = (tmp_path / "cli_smoke_metrics.jsonl").read_text().splitlines()
    assert any("train_loss" in ln for ln in metrics)


def test_find_batch_size_function():
    """Bounded batch-size search (the CLI flag calls this with a larger
    limit; each probe compiles, so the test keeps it tiny)."""
    from phyloformer_tpu.models import PhyloformerConfig
    from phyloformer_tpu.train import TrainConfig
    from phyloformer_tpu.train.cli import find_batch_size

    cfg = PhyloformerConfig(n_blocks=1, n_heads=2, embed_dim=16)
    tcfg = TrainConfig(total_steps=10, warmup_steps=1)
    bs = find_batch_size(cfg, tcfg, mesh=None, n=8, L=32, start=2, limit=4)
    assert bs >= 2


def test_coevolution_cli(sim_dataset, tmp_path):
    r = run_cli(
        "phyloformer_tpu.sim.cli_coevolution", sim_dataset / "trees",
        tmp_path / "coevo", "--seqlen", 30, "--seed", 1,
    )
    assert r.returncode == 0, r.stderr[-500:]
    fa = sorted((tmp_path / "coevo").glob("*.fa"))
    assert len(fa) == 6

    from phyloformer_tpu.data import read_fasta

    aln = read_fasta(fa[0])
    assert aln.seq_len == 30


def test_msa_cli_roundtrip(sim_dataset, tmp_path):
    msa = sorted((sim_dataset / "msas").glob("*.fa"))[0]
    r = run_cli("phyloformer_tpu.data.cli_msa_tools", "stats", msa)
    assert r.returncode == 0
    st = json.loads(r.stdout)
    assert st["n_seqs"] == 8
    r = run_cli("phyloformer_tpu.data.cli_msa_tools", "trim", msa,
                "-o", tmp_path / "t.fa", "--length", 30)
    assert r.returncode == 0
    from phyloformer_tpu.data import read_fasta

    assert read_fasta(tmp_path / "t.fa").seq_len == 30
