"""Parity of the pipelined fused forward (ops/pallas/pipeline.py).

Interpret-mode (CPU) checks: the merged block-boundary kernels + in-kernel
pair gather + in-kernel head must reproduce the XLA forward exactly (fp32
storage, HIGHEST matmuls) and within bf16 tolerance for bfloat16 storage.
On-chip validation happens through bench.py's accuracy gate and
``pf-bench accuracy-grid``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phyloformer_tpu.models.params import PhyloformerConfig, init_params
from phyloformer_tpu.models.phyloformer import forward
from phyloformer_tpu.ops.pallas.pipeline import (
    forward_fused_pipeline,
    pipeline_supported,
)


def _random_case(seed, b=2, n=7, l=12, pad_l=4, pad_n=2):
    """Batch with padded sites/seqs so masking is exercised."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 20, (b, n + pad_n, l + pad_l)).astype(np.int32)
    site_mask = np.zeros((b, l + pad_l), bool)
    site_mask[:, :l] = True
    seq_mask = np.zeros((b, n + pad_n), bool)
    seq_mask[:, :n] = True
    # zero out padding codes (real pipelines pad with zeros)
    codes[:, n:, :] = 0
    codes[:, :, l:] = 0
    return codes, site_mask, seq_mask


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_pipeline_matches_xla_fp32(n_blocks):
    cfg = PhyloformerConfig(n_blocks=n_blocks, matmul_precision="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    codes, site_mask, seq_mask = _random_case(1)

    want = forward(params, jnp.asarray(codes), cfg,
                   site_mask=jnp.asarray(site_mask),
                   seq_mask=jnp.asarray(seq_mask))
    got = forward_fused_pipeline(
        params, jnp.asarray(codes), codes.shape[1],
        jnp.asarray(site_mask), jnp.asarray(seq_mask),
        n_heads=cfg.n_heads, eps=cfg.ln_eps, interpret=True,
        mxu_precision="highest", act_dtype_name="float32",
    )
    assert got.shape == want.shape
    # only real pairs are compared by callers; padded-pair lanes can hold
    # garbage — mask them out the way the engine does
    from phyloformer_tpu.models.phyloformer import pair_mask_from_seq_mask

    pm = np.asarray(pair_mask_from_seq_mask(jnp.asarray(seq_mask),
                                            codes.shape[1]))
    err = np.abs(np.asarray(got) - np.asarray(want))[pm].max()
    assert err < 5e-5, err


def test_pipeline_bf16_storage_close():
    cfg = PhyloformerConfig(n_blocks=2, matmul_precision="float32")
    params = init_params(jax.random.PRNGKey(1), cfg)
    codes, site_mask, seq_mask = _random_case(2)

    want = forward(params, jnp.asarray(codes), cfg,
                   site_mask=jnp.asarray(site_mask),
                   seq_mask=jnp.asarray(seq_mask))
    got = forward_fused_pipeline(
        params, jnp.asarray(codes), codes.shape[1],
        jnp.asarray(site_mask), jnp.asarray(seq_mask),
        n_heads=cfg.n_heads, eps=cfg.ln_eps, interpret=True,
        mxu_precision="highest", act_dtype_name="bfloat16",
    )
    from phyloformer_tpu.models.phyloformer import pair_mask_from_seq_mask

    pm = np.asarray(pair_mask_from_seq_mask(jnp.asarray(seq_mask),
                                            codes.shape[1]))
    err = np.abs(np.asarray(got) - np.asarray(want))[pm].max()
    # bf16 storage rounds the residual stream between kernels only
    assert err < 3e-2, err


def test_pipeline_xla_gather_fallback(monkeypatch):
    """Shrinking the embedding VMEM budget must flip to the XLA-gather
    fallback with identical results."""
    import phyloformer_tpu.ops.pallas.pipeline as pipe

    cfg = PhyloformerConfig(n_blocks=2, matmul_precision="float32")
    params = init_params(jax.random.PRNGKey(2), cfg)
    codes, site_mask, seq_mask = _random_case(3)
    args = (params, jnp.asarray(codes), codes.shape[1],
            jnp.asarray(site_mask), jnp.asarray(seq_mask))
    kw = dict(n_heads=cfg.n_heads, eps=cfg.ln_eps, interpret=True,
              mxu_precision="highest", act_dtype_name="float32")

    with_gather = forward_fused_pipeline(*args, **kw)
    monkeypatch.setattr(pipe, "_P0_EMB_BUDGET_BYTES", 0)
    # the budget module constant is read at trace time and is not part of
    # the jit cache key — clear so the budget branch re-traces (the env
    # knobs PF_PIPE_* by contrast ARE static args since round 5)
    pipe._forward_pipeline_jit._clear_cache()
    without = forward_fused_pipeline(*args, **kw)
    pipe._forward_pipeline_jit._clear_cache()

    from phyloformer_tpu.models.phyloformer import pair_mask_from_seq_mask

    pm = np.asarray(pair_mask_from_seq_mask(jnp.asarray(seq_mask),
                                            codes.shape[1]))
    err = np.abs(np.asarray(with_gather) - np.asarray(without))[pm].max()
    assert err < 1e-5, err


def test_pipeline_gelu_variants():
    """gelu_mode is a real static arg: "tanh" tracks the exact-erf forward
    within the known approximation bound; "exact" is the default."""
    cfg = PhyloformerConfig(n_blocks=2, matmul_precision="float32")
    params = init_params(jax.random.PRNGKey(4), cfg)
    codes, site_mask, seq_mask = _random_case(5)
    args = (params, jnp.asarray(codes), codes.shape[1],
            jnp.asarray(site_mask), jnp.asarray(seq_mask))
    kw = dict(n_heads=cfg.n_heads, eps=cfg.ln_eps, interpret=True,
              mxu_precision="highest", act_dtype_name="float32")

    exact = forward_fused_pipeline(*args, **kw, gelu_mode="exact")
    tanh = forward_fused_pipeline(*args, **kw, gelu_mode="tanh")
    from phyloformer_tpu.models.phyloformer import pair_mask_from_seq_mask

    pm = np.asarray(pair_mask_from_seq_mask(jnp.asarray(seq_mask),
                                            codes.shape[1]))
    delta = np.abs(np.asarray(exact) - np.asarray(tanh))[pm]
    assert delta.max() > 0  # distinct paths actually traced
    assert delta.max() < 5e-3, delta.max()


def test_pipeline_env_knobs_in_cache_key(monkeypatch):
    """ADVICE r4: PF_PIPE_* must take effect without manual cache clears —
    changing PF_PIPE_NO_PREEXPAND in-process re-traces (same output)."""
    codes, site_mask, seq_mask = _random_case(6)
    cfg = PhyloformerConfig(n_blocks=1, matmul_precision="float32")
    params = init_params(jax.random.PRNGKey(5), cfg)
    args = (params, jnp.asarray(codes), codes.shape[1],
            jnp.asarray(site_mask), jnp.asarray(seq_mask))
    kw = dict(n_heads=cfg.n_heads, eps=cfg.ln_eps, interpret=True,
              mxu_precision="highest", act_dtype_name="float32")

    monkeypatch.delenv("PF_PIPE_NO_PREEXPAND", raising=False)
    a = forward_fused_pipeline(*args, **kw)
    monkeypatch.setenv("PF_PIPE_NO_PREEXPAND", "1")
    b = forward_fused_pipeline(*args, **kw)
    from phyloformer_tpu.models.phyloformer import pair_mask_from_seq_mask

    pm = np.asarray(pair_mask_from_seq_mask(jnp.asarray(seq_mask),
                                            codes.shape[1]))
    err = np.abs(np.asarray(a) - np.asarray(b))[pm].max()
    assert err < 1e-5, err


def test_pipeline_supported_caps():
    assert pipeline_supported(60, 256, "default")
    assert pipeline_supported(200, 1024, "default")
    assert not pipeline_supported(60, 4096, "default")
    assert not pipeline_supported(60, 2048, "highest")
