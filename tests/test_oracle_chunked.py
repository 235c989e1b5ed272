"""The sequential P-chunked fp32 oracle (infer/oracle.py) must reproduce
the monolithic XLA fp32 forward to summation-order tolerance — it is the
accuracy oracle for corners whose monolithic activations exceed HBM
((200, 1000), VERDICT r4 #7)."""

import numpy as np

import jax
import jax.numpy as jnp

from phyloformer_tpu.infer.oracle import predict_fp32_chunked
from phyloformer_tpu.models.params import PhyloformerConfig, init_params
from phyloformer_tpu.models.phyloformer import forward


def test_chunked_oracle_matches_monolithic_fp32():
    cfg = PhyloformerConfig(n_blocks=3, matmul_precision="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n, l = 12, 40
    codes = rng.integers(0, 20, (n, l)).astype(np.int32)

    want = np.asarray(
        forward(params, jnp.asarray(codes)[None], cfg))[0]
    got = predict_fp32_chunked(params, codes, n_heads=cfg.n_heads,
                               eps=cfg.ln_eps, n_chunks=5)
    assert got.shape == want.shape == (n * (n - 1) // 2,)
    err = np.abs(got - want).max()
    assert err < 1e-5, err


def test_chunked_oracle_chunk_count_invariant():
    cfg = PhyloformerConfig(n_blocks=2, matmul_precision="float32")
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 20, (9, 24)).astype(np.int32)
    a = predict_fp32_chunked(params, codes, n_heads=cfg.n_heads,
                             eps=cfg.ln_eps, n_chunks=1)
    b = predict_fp32_chunked(params, codes, n_heads=cfg.n_heads,
                             eps=cfg.ln_eps, n_chunks=7)
    assert np.abs(a - b).max() < 1e-5
