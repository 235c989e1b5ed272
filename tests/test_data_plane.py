"""Data-plane unit tests: FASTA codec, pair indices, newick, PHYLIP."""

import numpy as np
import pytest

from phyloformer_tpu.data import (
    ALPHABET,
    encode_bytes,
    matrix_to_phylip,
    n_pairs,
    pair_indices,
    parse_newick,
    patristic_matrix,
    patristic_vector,
    read_fasta,
    read_phylip,
    seq2pair_matrix,
    tree_diameter,
    vec_to_phylip,
    vector_to_square,
)
from phyloformer_tpu.data.fasta import load_alignment, write_fasta


def test_alphabet_order():
    # Exact 22-symbol alphabet and index order of the reference
    # (/root/reference/phyloformer/data.py:7).
    assert ALPHABET == b"ARNDCQEGHILKMFPSTWYVX-"
    codes = encode_bytes(b"AR-X")
    assert codes.tolist() == [0, 1, 21, 20]


def test_encode_rejects_bad_bytes():
    with pytest.raises(ValueError):
        encode_bytes(b"AB")  # B is not in the alphabet


def test_fasta_roundtrip(tmp_path):
    fa = tmp_path / "toy.fa"
    fa.write_text(">tax one\nARND\n>t2\nCQ-G\n")
    aln = read_fasta(fa)
    assert aln.ids == ["tax one", "t2"]
    assert aln.codes.shape == (2, 4)
    out = tmp_path / "round.fa"
    write_fasta(out, aln)
    aln2 = read_fasta(out)
    assert aln2.ids == aln.ids
    assert np.array_equal(aln2.codes, aln.codes)


def test_fasta_multiline_and_onehot_layout(tmp_path):
    fa = tmp_path / "ml.fa"
    fa.write_text(">a\nAR\nND\n>b\nCQEG\n")
    oh, ids = load_alignment(fa)
    # Reference layout (22, L, n).
    assert oh.shape == (22, 4, 2)
    assert ids == ["a", "b"]
    # one-hot of 'A' (code 0) at site 0 of seq 0
    assert oh[0, 0, 0] == 1.0 and oh[:, 0, 0].sum() == 1.0
    # 'D' = code 3 at site 3 of seq a
    assert oh[3, 3, 0] == 1.0


def test_fasta_ragged_rejected(tmp_path):
    fa = tmp_path / "bad.fa"
    fa.write_text(">a\nARN\n>b\nCQ\n")
    with pytest.raises(ValueError):
        read_fasta(fa)


def test_pair_indices_match_seq2pair():
    for n in (2, 3, 5, 20, 50):
        i_idx, j_idx = pair_indices(n)
        mat = seq2pair_matrix(n)
        assert mat.shape == (n_pairs(n), n)
        # Row k has ones exactly at (i_k, j_k), and the gather-add equals the
        # reference's (P, n) @ (n, F) matmul on random data.
        x = np.random.default_rng(0).normal(size=(n, 7)).astype(np.float32)
        ref = mat @ x
        ours = x[i_idx] + x[j_idx]
        np.testing.assert_allclose(ref, ours, rtol=1e-6)


def test_pair_enumeration_order():
    # Must match `for i in range(n): for j in range(i+1, n)` of
    # /root/reference/phyloformer/model.py:12-17 and itertools.combinations.
    from itertools import combinations

    i_idx, j_idx = pair_indices(5)
    assert list(zip(i_idx.tolist(), j_idx.tolist())) == list(combinations(range(5), 2))


def test_newick_parse_print_roundtrip():
    s = "((A:0.1,B:0.2)n1:0.05,(C:0.3,'D d':0.4):0.07,E:1e-3);"
    root = parse_newick(s)
    assert sorted(root.leaf_names()) == ["A", "B", "C", "D d", "E"]
    s2 = root.to_newick()
    root2 = parse_newick(s2)
    m1, _ = patristic_matrix(root, sorted(root.leaf_names()))
    m2, _ = patristic_matrix(root2, sorted(root.leaf_names()))
    np.testing.assert_allclose(m1, m2, atol=1e-12)


def test_patristic_distances_hand_computed():
    root = parse_newick("((A:1,B:2):0.5,(C:3,D:4):0.25);")
    mat, names = patristic_matrix(root, ["A", "B", "C", "D"])
    assert mat[0, 1] == pytest.approx(3.0)  # A-B
    assert mat[0, 2] == pytest.approx(1 + 0.5 + 0.25 + 3)  # A-C
    assert mat[1, 3] == pytest.approx(2 + 0.5 + 0.25 + 4)  # B-D
    assert np.allclose(mat, mat.T) and np.all(np.diag(mat) == 0)
    vec = patristic_vector(root, ["A", "B", "C", "D"])
    np.testing.assert_allclose(vec, mat[np.triu_indices(4, 1)], rtol=1e-6)


def test_patristic_order_follows_ids():
    root = parse_newick("((A:1,B:2):0.5,C:3);")
    m1, _ = patristic_matrix(root, ["C", "A", "B"])
    m2, _ = patristic_matrix(root, ["A", "B", "C"])
    assert m1[0, 1] == m2[0, 2]  # C-A distance in both orders


def test_tree_diameter():
    root = parse_newick("((A:1,B:2):0.5,(C:3,D:4):0.25);")
    # farthest pair: C to D inside the second clade = 3 + 4 = 7
    assert tree_diameter(root) == pytest.approx(7.0)


def test_phylip_writer_format():
    vec = np.array([0.123456789012, 0.2, 0.3], dtype=np.float64)
    dm, text = vec_to_phylip(vec, ["t1", "t2", "t3"])
    lines = text.splitlines()
    assert lines[0] == "3"
    assert lines[1].startswith("t1 0.0000000000 0.1234567890 0.2000000000")
    # round-trip
    mat, ids = read_phylip(text)
    assert ids == ["t1", "t2", "t3"]
    np.testing.assert_allclose(mat, dm, atol=1e-10)


def test_vector_square_roundtrip():
    rng = np.random.default_rng(1)
    vec = rng.uniform(size=n_pairs(10)).astype(np.float32)
    sq = vector_to_square(vec, 10)
    from phyloformer_tpu.data import square_to_vector

    np.testing.assert_array_equal(square_to_vector(sq), vec)


def test_reference_testdata_loads(testdata_dir):
    aln = read_fasta(testdata_dir / "msas" / "0_20_tips.fa")
    assert aln.n_seqs == 20 and aln.seq_len == 250
    from phyloformer_tpu.data import read_newick

    tree = read_newick(testdata_dir / "trees" / "0_20_tips.nwk")
    assert sorted(tree.leaf_names()) == sorted(aln.ids)
    vec = patristic_vector(tree, aln.ids)
    assert vec.shape == (190,)
    assert (vec > 0).all()


def test_newick_fuzz_roundtrip():
    """Random trees (incl. odd labels) survive print->parse->distance."""
    import random as _random

    from phyloformer_tpu.data.newick import Node

    rng = np.random.default_rng(0)
    pyrng = _random.Random(0)
    for trial in range(15):
        n = int(rng.integers(3, 40))
        labels = [
            pyrng.choice([f"T{i}", f"sp {i}", f"x'{i}", f"a:b_{i}"]) for i in range(n)
        ]
        nodes = [Node(lbl, float(rng.uniform(0.001, 5))) for lbl in labels]
        while len(nodes) > 2:
            i, j = sorted(rng.choice(len(nodes), 2, replace=False))
            parent = Node("", float(rng.uniform(0.001, 5)))
            parent.add_child(nodes[i]); parent.add_child(nodes[j])
            nodes = [nodes[k] for k in range(len(nodes)) if k not in (i, j)] + [parent]
        root = Node("")
        for c in nodes:
            root.add_child(c)
        text = root.to_newick()
        again = parse_newick(text)
        order = sorted(root.leaf_names())
        m1, _ = patristic_matrix(root, order)
        m2, _ = patristic_matrix(again, order)
        np.testing.assert_allclose(m1, m2, rtol=1e-9)


def test_engine_fuzz_shapes():
    """Random (n, L) mixes through the batched engine: outputs well-formed."""
    from phyloformer_tpu.data.fasta import Alignment
    from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
    from phyloformer_tpu.models import PhyloformerConfig, init_params
    import jax

    rng = np.random.default_rng(1)
    cfg = PhyloformerConfig(n_blocks=1, n_heads=2, embed_dim=16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = InferenceEngine(params, cfg, InferenceConfig(n_buckets=(8, 16), l_buckets=(32, 64)))
    alns = []
    for _ in range(7):
        n = int(rng.integers(4, 17))
        L = int(rng.integers(10, 65))
        alns.append(Alignment(codes=rng.integers(0, 22, (n, L)).astype(np.int8),
                              ids=[f"t{k}" for k in range(n)]))
    preds = eng.predict(alns)
    for a, v in zip(alns, preds):
        assert v.shape == (a.n_seqs * (a.n_seqs - 1) // 2,)
        assert np.isfinite(v).all() and (v >= 0).all()
