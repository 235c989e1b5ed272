"""Attention-variant ablation ops + MSA utilities tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phyloformer_tpu.data.fasta import Alignment
from phyloformer_tpu.data.msa_tools import (
    concat,
    dedup,
    remove_gap_columns,
    sample,
    stats,
    subset,
    trim,
)
from phyloformer_tpu.ops.attention import (
    linear_kernel_attention,
    multi_head_attention,
    scaled_linear_attention,
)


def _params(d, qk, rng):
    return {
        "wq": jnp.asarray(rng.normal(size=(d, qk), scale=0.2).astype(np.float32)),
        "bq": jnp.zeros(qk, jnp.float32),
        "wk": jnp.asarray(rng.normal(size=(d, qk), scale=0.2).astype(np.float32)),
        "bk": jnp.zeros(qk, jnp.float32),
        "wv": jnp.asarray(rng.normal(size=(d, d), scale=0.2).astype(np.float32)),
        "bv": jnp.zeros(d, jnp.float32),
        "wo": jnp.asarray(rng.normal(size=(d, d), scale=0.2).astype(np.float32)),
        "bo": jnp.zeros(d, jnp.float32),
    }


def test_mha_softmax_vs_numpy():
    rng = np.random.default_rng(0)
    d, h = 16, 4
    p = _params(d, d, rng)
    x = jnp.asarray(rng.normal(size=(2, 3, 10, d)).astype(np.float32))
    out = multi_head_attention(x, p, h)
    assert out.shape == x.shape
    # uniform value rows -> attention output independent of queries
    v_const = dict(p)
    xc = jnp.ones_like(x)
    out_c = multi_head_attention(xc, v_const, h)
    assert np.allclose(np.asarray(out_c), np.asarray(out_c)[..., :1, :], atol=1e-5)


def test_linear_kernel_attention_mask_noop():
    rng = np.random.default_rng(1)
    d, h = 16, 4
    p = _params(d, d, rng)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, d)).astype(np.float32))
    base = linear_kernel_attention(x, p, h)
    # pad the attended axis; mask must make it a no-op
    xp = jnp.concatenate([x, jnp.ones((1, 2, 3, d))], axis=-2)
    mask = jnp.asarray(np.arange(11)[None, None, :] < 8)
    out = linear_kernel_attention(xp, p, h, mask=mask)
    np.testing.assert_allclose(
        np.asarray(out)[..., :8, :], np.asarray(base), atol=2e-5
    )


def test_scaled_vs_linear_variants_differ():
    """Sanity: the three variants are genuinely different operators."""
    rng = np.random.default_rng(2)
    d, h = 16, 4
    x = jnp.asarray(rng.normal(size=(1, 2, 8, d)).astype(np.float32))
    p_full = _params(d, d, rng)
    p_small = _params(d, h, rng)
    a = scaled_linear_attention(x, p_small, h)
    b = linear_kernel_attention(x, p_full, h)
    c = multi_head_attention(x, p_full, h)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(b), np.asarray(c))


def _toy():
    codes = np.array(
        [[0, 1, 21, 3], [0, 1, 21, 3], [4, 5, 6, 7], [4, 5, 21, 7]], dtype=np.int8
    )
    return Alignment(codes=codes, ids=["a", "b", "c", "d"])


def test_dedup():
    aln, dropped = dedup(_toy())
    assert dropped == ["b"]
    assert aln.ids == ["a", "c", "d"]


def test_trim_subset_sample_gapcols_concat_stats():
    aln = _toy()
    assert trim(aln, 2).seq_len == 2
    sub = subset(aln, ["d", "a"])
    assert sub.ids == ["d", "a"] and sub.codes[0, 0] == 4
    assert sample(aln, 2, seed=0).n_seqs == 2
    nog = remove_gap_columns(aln)
    assert nog.seq_len == 3  # only column 2 (gaps in a, b, d) is dropped
    st = stats(aln)
    assert st["n_duplicate_seqs"] == 1
    cat = concat([aln, aln])
    assert cat.seq_len == 8 and cat.n_seqs == 4
