"""Baseline tree-method tests (Hamming/ML distances, ML refinement, FastTree)."""

import numpy as np
import pytest

from phyloformer_tpu.data import parse_newick, patristic_matrix
from phyloformer_tpu.sim import MsaSimConfig, evolve_alignment
from phyloformer_tpu.trees.baselines import (
    fasttree_adapter,
    hamming_distance_matrix,
    ml_pairwise_distances,
    optimize_branch_lengths,
)

native = pytest.importorskip("phyloformer_tpu.trees.native")
try:
    native.build_native()
    HAVE_NATIVE = True
except native.NativeUnavailable:
    HAVE_NATIVE = False


@pytest.fixture(scope="module")
def sim_case():
    rng = np.random.default_rng(0)
    true = parse_newick(
        "((A:0.15,B:0.2):0.1,(C:0.25,D:0.15):0.12,(E:0.2,F:0.1):0.08);"
    )
    aln = evolve_alignment(true, MsaSimConfig(substitution="LG", length=800), rng)
    return true, aln


def test_hamming_matrix_properties(sim_case):
    true, aln = sim_case
    d = hamming_distance_matrix(aln, "poisson")
    assert d.shape == (6, 6)
    assert np.allclose(d, d.T) and (np.diag(d) == 0).all()
    # close pair (A,B) < far pair (A,C) in the simulating tree
    i = {name: k for k, name in enumerate(aln.ids)}
    assert d[i["A"], i["B"]] < d[i["A"], i["C"]]


def test_ml_distances_recover_branch_scale(sim_case):
    """Pairwise ML distances under the generating model approximate the
    true patristic distances."""
    true, aln = sim_case
    d = ml_pairwise_distances(aln)
    tm, _ = patristic_matrix(true, aln.ids)
    iu = np.triu_indices(6, 1)
    rel_err = np.abs(d[iu] - tm[iu]) / tm[iu]
    assert np.median(rel_err) < 0.25, rel_err


@pytest.mark.skipif(not HAVE_NATIVE, reason="native toolkit needed")
def test_hamming_and_ml_fastme_topology(sim_case):
    from phyloformer_tpu.trees.baselines import hamming_fastme_tree, ml_fastme_tree

    true, aln = sim_case
    for builder in (hamming_fastme_tree, ml_fastme_tree):
        nwk = builder(aln)
        cmp = native.compare_newick(true.to_newick(), nwk)
        assert cmp.rf == 0, f"{builder.__name__} got topology wrong"


def test_optimize_branch_lengths_improves_ll(sim_case):
    from phyloformer_tpu.trees.likelihood import log_likelihood

    true, aln = sim_case
    import copy

    tree = copy.deepcopy(true)
    for node in tree.traverse_preorder():
        if node.length is not None:
            node.length = 0.5  # wreck the lengths
    before = log_likelihood(aln, tree)
    after = optimize_branch_lengths(aln, tree, rounds=2)
    assert after > before
    truth = log_likelihood(aln, true)
    # coordinate-wise optimization should land near (often above) the
    # true-branch-length likelihood
    assert after > truth - 15


def test_fasttree_adapter_if_available(sim_case):
    true, aln = sim_case
    try:
        nwk = fasttree_adapter(aln)
    except (FileNotFoundError, RuntimeError) as err:
        pytest.skip(f"FastTree unavailable: {err}")
    tree = parse_newick(nwk)
    assert sorted(tree.leaf_names()) == sorted(aln.ids)


def test_spr_neighbors_valid_and_reach_true_topology(sim_case):
    """SPR neighborhood: every candidate keeps the leaf set; a 1-SPR
    perturbation of the true tree has the true topology in its
    neighborhood (radius 3)."""
    from phyloformer_tpu.trees.baselines import _spr_neighbors

    true, _ = sim_case
    ids = sorted(true.leaf_names())
    # perturb: move leaf A next to E (an SPR move NNI needs >1 sweep for)
    perturbed = parse_newick(
        "(B:0.2,(C:0.25,D:0.15):0.12,((E:0.2,A:0.15):0.05,F:0.1):0.08);"
    )
    found_true = False
    count = 0
    for cand in _spr_neighbors(perturbed, radius=4):
        count += 1
        assert sorted(cand.leaf_names()) == ids
        cmp = native.compare_newick(true.to_newick(), cand.to_newick())
        if cmp.rf == 0:
            found_true = True
    assert count > 10
    assert found_true, "true topology not in the SPR neighborhood"


def test_ml_refine_spr_recovers_distant_misplacement(sim_case):
    """ml_refine with SPR must beat NNI-only from a start tree whose
    misplacement needs a long-range move."""
    from phyloformer_tpu.trees.baselines import ml_refine

    true, aln = sim_case
    start = "(B:0.2,(C:0.25,D:0.15):0.12,((E:0.2,A:0.15):0.05,F:0.1):0.08);"
    nwk_spr, ll_spr = ml_refine(aln, start, max_sweeps=2, spr=True,
                                optimize_lengths=False)
    _, ll_nni = ml_refine(aln, start, max_sweeps=2, spr=False,
                          optimize_lengths=False)
    assert ll_spr >= ll_nni - 1e-6
    cmp = native.compare_newick(true.to_newick(), nwk_spr)
    assert cmp.rf == 0, "SPR refinement failed to recover the true topology"


def test_cat_site_categories():
    """CAT rate categories: sites simulated under strong rate heterogeneity
    get spread over categories, and the CAT likelihood beats the
    homogeneous one on the true tree."""
    from phyloformer_tpu.trees.likelihood import (
        estimate_site_categories,
        log_likelihood,
    )

    rng = np.random.default_rng(3)
    true = parse_newick(
        "((A:0.15,B:0.2):0.1,(C:0.25,D:0.15):0.12,(E:0.2,F:0.1):0.08);"
    )
    aln = evolve_alignment(
        true, MsaSimConfig(substitution="LG", length=600, gamma="GC",
                           alpha=0.4), rng
    )
    rates, cats = estimate_site_categories(aln, true, n_cats=12)
    assert cats.shape == (aln.seq_len,)
    assert len(np.unique(cats)) >= 3  # heterogeneity detected
    assert abs(float(np.mean(rates[cats])) - 1.0) < 1e-6  # normalized
    ll_cat = log_likelihood(aln, true, site_categories=(rates, cats))
    ll_flat = log_likelihood(aln, true)
    assert np.isfinite(ll_cat) and ll_cat > ll_flat
