"""Simulator tests: substitution models, tree simulation, MSA evolution,
Gillespie coevolution."""

import numpy as np
import pytest

from phyloformer_tpu.data import parse_newick, patristic_matrix
from phyloformer_tpu.sim import (
    MsaSimConfig,
    TreeSimConfig,
    discrete_gamma_rates,
    evolve_alignment,
    get_model,
    simulate_tree,
)
from phyloformer_tpu.sim.models import AA_ORDER


def test_lg_model_properties():
    lg = get_model("LG")
    q = lg.rate_matrix()
    # generator rows sum to 0, off-diagonals nonnegative
    np.testing.assert_allclose(q.sum(axis=1), 0, atol=1e-12)
    assert (q - np.diag(np.diag(q)) >= 0).all()
    # unit expected rate
    assert -(lg.freqs * np.diag(q)).sum() == pytest.approx(1.0)
    # detailed balance (reversibility): pi_i q_ij == pi_j q_ji
    lhs = lg.freqs[:, None] * q
    np.testing.assert_allclose(lhs, lhs.T, atol=1e-9)
    # published LG values (Le & Gascuel 2008) survive the round trip
    R = lg.exchangeabilities
    assert R[0, 1] == pytest.approx(0.425093, abs=1e-6)
    assert R[2, 3] == pytest.approx(5.076149, abs=1e-5)
    assert lg.freqs[0] == pytest.approx(0.079066, abs=1e-6)


@pytest.mark.parametrize("name", ["LG", "WAG", "JTT", "Poisson"])
def test_transition_matrix_is_stochastic(name):
    m = get_model(name)
    for t in (0.01, 0.5, 3.0):
        p = m.transition_matrix(t)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-9)
        assert (p >= -1e-12).all()
    # long-time limit -> stationary distribution
    p_inf = m.transition_matrix(500.0)
    np.testing.assert_allclose(p_inf, np.tile(m.freqs, (20, 1)), atol=1e-6)


def test_paml_roundtrip(tmp_path):
    from phyloformer_tpu.sim.models import load_paml_dat

    lg = get_model("LG")
    # write a PAML .dat and re-read
    lines = []
    for i in range(1, 20):
        lines.append(" ".join(f"{lg.exchangeabilities[i, j]:.6f}" for j in range(i)))
    lines.append(" ".join(f"{f:.6f}" for f in lg.freqs))
    p = tmp_path / "lg.dat"
    p.write_text("\n".join(lines) + "\n")
    again = load_paml_dat(p)
    np.testing.assert_allclose(
        again.exchangeabilities, lg.exchangeabilities, atol=1e-5
    )


def test_discrete_gamma_rates():
    rates = discrete_gamma_rates(0.5, 4)
    assert rates.shape == (4,)
    assert rates.mean() == pytest.approx(1.0)
    assert (np.diff(rates) > 0).all()  # increasing categories


def test_simulate_tree_birth_death():
    rng = np.random.default_rng(0)
    cfg = TreeSimConfig(ntips=20)
    tree = simulate_tree(rng, cfg)
    leaves = tree.leaves()
    assert len(leaves) == 20
    assert len({leaf.name for leaf in leaves}) == 20
    # leaf clamp respected
    assert all((leaf.length or 0) >= cfg.min_branch for leaf in leaves)
    # diameter in the prior's plausible range
    from phyloformer_tpu.data import tree_diameter

    assert 0.0179 < tree_diameter(tree) < 16.0


def test_simulate_tree_uniform():
    rng = np.random.default_rng(1)
    tree = simulate_tree(rng, TreeSimConfig(ntips=12, tree_type="uniform"))
    assert len(tree.leaves()) == 12


def test_evolved_alignment_shape_and_divergence():
    rng = np.random.default_rng(2)
    tree = parse_newick("((A:0.05,B:0.05):0.3,(C:0.05,D:0.05):0.3);")
    cfg = MsaSimConfig(substitution="LG", length=400)
    aln = evolve_alignment(tree, cfg, rng)
    assert aln.codes.shape == (4, 400)
    assert sorted(aln.ids) == ["A", "B", "C", "D"]

    def ham(x, y):
        return (x != y).mean()

    i = {name: k for k, name in enumerate(aln.ids)}
    # close pairs (A,B) much more similar than far pairs (A,C)
    assert ham(aln.codes[i["A"]], aln.codes[i["B"]]) < ham(
        aln.codes[i["A"]], aln.codes[i["C"]]
    )


def test_evolution_distance_calibration():
    """Expected substitutions/site == branch length (unit-rate model):
    p_diff for LG at t=0.3 from the analytic transition matrix."""
    rng = np.random.default_rng(3)
    lg = get_model("LG")
    t = 0.3
    p = lg.transition_matrix(t)
    expected_diff = 1.0 - (lg.freqs * np.diag(p)).sum()
    tree = parse_newick(f"(A:{t / 2},B:{t / 2});")
    cfg = MsaSimConfig(substitution="LG", length=8000)
    aln = evolve_alignment(tree, cfg, rng)
    observed = (aln.codes[0] != aln.codes[1]).mean()
    assert observed == pytest.approx(expected_diff, abs=0.02)


def test_gamma_rates_slow_divergence():
    rng = np.random.default_rng(4)
    tree = parse_newick("(A:0.25,B:0.25);")
    base = evolve_alignment(tree, MsaSimConfig(length=4000), rng)
    gc = evolve_alignment(
        tree, MsaSimConfig(length=4000, gamma="GC", alpha=0.3), rng
    )
    # strong rate heterogeneity concentrates changes -> fewer differing sites
    assert (gc.codes[0] != gc.codes[1]).mean() < (base.codes[0] != base.codes[1]).mean()


def test_indels_produce_gaps_and_trim(tmp_path):
    from phyloformer_tpu.data import GAP_CODE, read_fasta
    from phyloformer_tpu.sim import simulate_msa

    rng = np.random.default_rng(5)
    tree_path = tmp_path / "t.nwk"
    tree_path.write_text("((A:0.4,B:0.4):0.2,(C:0.4,D:0.4):0.2);\n")
    out = tmp_path / "t.fa"
    cfg = MsaSimConfig(length=300, indels=True, max_attempts=5)
    ok, attempts = simulate_msa(tree_path, out, cfg, rng)
    assert ok
    aln = read_fasta(out)
    assert aln.seq_len <= 300
    untrimmed = read_fasta(str(out) + ".untrimmed")
    assert untrimmed.seq_len >= aln.seq_len
    assert (untrimmed.codes == GAP_CODE).any()  # indels produced gaps


def test_duplicate_rejection(tmp_path):
    from phyloformer_tpu.sim import simulate_msa

    rng = np.random.default_rng(6)
    tree_path = tmp_path / "t.nwk"
    # zero-length branches -> all sequences identical -> every attempt fails
    tree_path.write_text("((A:0,B:0):0,C:0);\n")
    out = tmp_path / "t.fa"
    ok, attempts = simulate_msa(tree_path, out, MsaSimConfig(length=50, max_attempts=3), rng)
    assert not ok and attempts == 3


def test_gillespie_coevolution():
    from phyloformer_tpu.sim.gillespie import (
        compute_scale,
        paired_lg_model,
        simulate_coevolution_msa,
    )

    model = paired_lg_model(coupling=0.5)
    assert len(model.states) == 400
    np.testing.assert_allclose(model.rate_matrix.sum(axis=1), 0, atol=1e-9)
    assert compute_scale(model.rate_matrix, model.freqs) == pytest.approx(1.0)

    rng = np.random.default_rng(7)
    tree = parse_newick("((A:0.1,B:0.1):0.1,(C:0.1,D:0.1):0.1);")
    aln = simulate_coevolution_msa(tree, seq_len=100, model=model, rng=rng)
    assert aln.codes.shape == (4, 100)  # 50 pair-sites -> 100 residues


def test_rate_table_io(tmp_path):
    from phyloformer_tpu.sim.gillespie import (
        build_ctmc,
        coevolution_model_from_files,
    )

    states = ["AA", "AB", "BA", "BB"]
    rng = np.random.default_rng(8)
    exch = rng.uniform(0.1, 1, (4, 4))
    exch = (exch + exch.T) / 2
    np.fill_diagonal(exch, 0)
    freqs = np.array([0.4, 0.3, 0.2, 0.1])

    rates_path = tmp_path / "rates.txt"
    rates_path.write_text(
        " ".join(states) + "\n" +
        "\n".join(states[i] + " " + " ".join(f"{exch[i, j]:.8f}" for j in range(4)) for i in range(4))
        + "\n"
    )
    stat_path = tmp_path / "stat.txt"
    stat_path.write_text("\n".join(f"{s} {f}" for s, f in zip(states, freqs)) + "\n")

    model = coevolution_model_from_files(rates_path, stat_path)
    direct = build_ctmc(exch, freqs, states)
    np.testing.assert_allclose(model.rate_matrix, direct.rate_matrix, atol=1e-6)


def test_mdef_frequency_mixture(tmp_path):
    """IQ-TREE -mdef custom frequency-mixture models (the reference's
    --custom-model surface, alisim.py:185-191,255-263): nexus parsing, the
    reference's +NAME convention, and native simulation whose aggregate
    amino-acid composition tracks the mixture-weighted class frequencies."""
    import numpy as np

    from phyloformer_tpu.data.fasta import read_fasta
    from phyloformer_tpu.sim.models import load_mdef_nexus, parse_custom_model_name
    from phyloformer_tpu.sim.msa import MsaSimConfig, simulate_msa

    # two sharply different classes: class 1 favors A/R, class 2 favors Y/V
    f1 = np.full(20, 0.01); f1[0] = f1[1] = 0.41
    f2 = np.full(20, 0.01); f2[18] = f2[19] = 0.41
    nex = tmp_path / "custom.nex"
    nex.write_text(
        "#nexus\nbegin models;\n"
        "  [ test mixture ]\n"
        f"  frequency TST_F1 = {' '.join(f'{x:.4f}' for x in f1)};\n"
        f"  frequency TST_F2 = {' '.join(f'{x:.4f}' for x in f2)};\n"
        "  frequency TST_MIX = FMIX{TST_F1:1.0:0.5,TST_F2:1.0:0.5};\n"
        "end;\n"
    )
    assert parse_custom_model_name(nex) == "TST"
    mix = load_mdef_nexus(nex)
    assert mix.name == "TST" and len(mix.classes) == 2
    assert mix.weights == pytest.approx([0.5, 0.5])
    assert mix.class_rates() == pytest.approx([1.0, 1.0])

    # IQ-TREE's NAME[:rate] shorthand: one field after the name is a RATE
    # (uniform weights), not a weight
    nex2 = tmp_path / "rates.nex"
    nex2.write_text(
        "begin models;\n"
        f"  frequency TSR_F1 = {' '.join(f'{x:.4f}' for x in f1)};\n"
        f"  frequency TSR_F2 = {' '.join(f'{x:.4f}' for x in f2)};\n"
        "  frequency TSR_MIX = FMIX{TSR_F1:0.5,TSR_F2:2.0};\n"
        "end;\n"
    )
    mix2 = load_mdef_nexus(nex2)
    assert mix2.weights == pytest.approx([0.5, 0.5])
    assert mix2.class_rates() == pytest.approx([0.5, 2.0])

    tree = tmp_path / "t.nwk"
    tree.write_text("((A:0.05,B:0.05):0.05,(C:0.05,D:0.05):0.05);\n")
    out = tmp_path / "a.fa"
    ok, _ = simulate_msa(
        tree, out, MsaSimConfig(length=2000, mdef=str(nex)),
        rng=np.random.default_rng(0),
    )
    assert ok
    aln = read_fasta(out)
    counts = np.bincount(aln.codes.ravel(), minlength=22)[:20]
    obs = counts / counts.sum()
    expect = 0.5 * f1 / f1.sum() + 0.5 * f2 / f2.sum()
    # short branches keep states near equilibrium; composition must track
    # the mixture (A/R and Y/V each ~20.5%, others ~0.5%)
    assert np.abs(obs - expect).max() < 0.03


def test_device_engine_distance_calibration():
    """Batched on-device engine matches the analytic LG p_diff at t=0.3
    (same check as the CPU evolver's calibration test) and produces
    distinct, correctly-shaped alignments per tree."""
    from phyloformer_tpu.sim.device import simulate_msas_device

    rng = np.random.default_rng(7)
    lg = get_model("LG")
    t = 0.3
    p = lg.transition_matrix(t)
    expected_diff = 1.0 - (lg.freqs * np.diag(p)).sum()
    trees = [
        parse_newick(f"(A:{t / 2},B:{t / 2});"),
        parse_newick("((A:0.05,B:0.05):0.3,(C:0.05,D:0.05):0.3);"),
    ]
    cfg = MsaSimConfig(substitution="LG", length=6000)
    alns, attempts = simulate_msas_device(trees, cfg, rng, batch_size=2)
    assert all(a is not None for a in alns)
    assert alns[0].codes.shape == (2, 6000)
    assert alns[1].codes.shape == (4, 6000)
    observed = (alns[0].codes[0] != alns[0].codes[1]).mean()
    assert observed == pytest.approx(expected_diff, abs=0.02)
    # topology signal: close pairs more similar than far pairs
    i = {name: k for k, name in enumerate(alns[1].ids)}
    c = alns[1].codes
    assert (c[i["A"]] != c[i["B"]]).mean() < (c[i["A"]] != c[i["C"]]).mean()


def test_device_engine_cli(tmp_path):
    """`pf-simulate-alignments --engine device` writes paired .fa files."""
    import subprocess
    import sys

    treedir = tmp_path / "trees"
    treedir.mkdir()
    for k in range(3):
        (treedir / f"{k}_4_tips.nwk").write_text(
            "((A:0.1,B:0.1):0.2,(C:0.1,D:0.1):0.2);\n"
        )
    r = subprocess.run(
        [sys.executable, "-m", "phyloformer_tpu.sim.cli_msa",
         str(treedir), str(tmp_path / "msas"), "-l", "40",
         "--engine", "device", "--seed", "5", "--batch-size", "2"],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr
    msas = sorted((tmp_path / "msas").glob("*.fa"))
    assert [m.stem for m in msas] == [f"{k}_4_tips" for k in range(3)]
