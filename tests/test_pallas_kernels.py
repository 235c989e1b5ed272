"""Fused Pallas axial-block kernels vs the canonical XLA implementation.

Runs in interpret mode on CPU (the driver benches the compiled path on TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phyloformer_tpu.models import PhyloformerConfig, init_params
from phyloformer_tpu.models.phyloformer import axial_block
from phyloformer_tpu.ops.pallas import fused_axial_block
from phyloformer_tpu.ops.pallas.axial_block import fused_axial_block_res

CFG = PhyloformerConfig(n_blocks=1, n_heads=4, embed_dim=64)


def _layer(seed=0):
    params = init_params(jax.random.PRNGKey(seed), CFG)
    return params["layers"][0]


def _rand_x(b, p, l, d=64, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, p, l, d)).astype(np.float32))


@pytest.mark.parametrize("b,p,l", [(1, 45, 64), (2, 66, 96)])
def test_fused_block_matches_xla_full_mask(b, p, l):
    layer = _layer()
    x = _rand_x(b, p, l)
    site_mask = jnp.ones((b, l), bool)
    pair_mask = jnp.ones((b, p), bool)
    with jax.default_matmul_precision("float32"):
        want = axial_block(x, layer, CFG, site_mask, pair_mask)
        got = fused_axial_block(x, layer, site_mask, pair_mask, CFG.n_heads,
                                interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 2e-4, f"max err {err}"


def test_ltiled_block_matches_xla_with_padding():
    """The two-pass L-tiled kernels (site axes beyond VMEM residency) must
    match the canonical block, with padded sites/pairs exact no-ops.  Uses
    the impl directly so the test stays small (the dispatch threshold is
    L > 2048; compiled-path parity at L=4096/8192 is measured on the dev
    chip — docs/performance.md)."""
    from phyloformer_tpu.ops.pallas.axial_block import (
        _LTILE,
        _fused_block_ltiled_impl,
    )

    layer = _layer(3)
    b, p = 2, 30
    l = 2 * _LTILE + 40  # 3 site tiles, last one ragged
    real_p, real_l = 21, l - 57
    x = _rand_x(b, p, l, seed=5)
    site_mask = jnp.asarray(np.arange(l)[None, :] < real_l).repeat(b, 0)
    pair_mask = jnp.asarray(np.arange(p)[None, :] < real_p).repeat(b, 0)
    with jax.default_matmul_precision("float32"):
        want = axial_block(x, layer, CFG, site_mask, pair_mask)
        got, x1, stats = _fused_block_ltiled_impl(
            x, layer, site_mask, pair_mask, CFG.n_heads, 1e-5, True,
            jax.lax.Precision.HIGHEST)
        # and the resident fused path on the same input (shared residual
        # contract: x1/stats feed the fused backward)
        got_res, x1_res, stats_res = fused_axial_block_res(
            x, layer, site_mask, pair_mask, CFG.n_heads, interpret=True)
    err = np.abs(
        np.asarray(got)[:, :real_p, :real_l] - np.asarray(want)[:, :real_p, :real_l]
    ).max()
    assert err < 2e-4, f"max err {err}"
    err_x1 = np.abs(
        np.asarray(x1)[:, :real_p, :real_l] - np.asarray(x1_res)[:, :real_p, :real_l]
    ).max()
    assert err_x1 < 2e-4, f"x1 err {err_x1}"
    err_st = np.abs(
        np.asarray(stats)[:, :real_l] - np.asarray(stats_res)[:, :real_l]
    ).max()
    assert err_st < 2e-3, f"stats err {err_st}"


def test_forward_fused_dispatches_ltiled_beyond_residency(monkeypatch):
    """forward_fused must route long site axes through the L-tiled kernels
    (no XLA fallback) and still match the canonical forward."""
    import phyloformer_tpu.ops.pallas.axial_block as ab
    from phyloformer_tpu.models.phyloformer import forward, forward_fused

    # force the split path (HI is the threshold actually consulted here:
    # matmul_precision="float32" maps to HIGHEST kernels)
    monkeypatch.setattr(ab, "_RESIDENT_SITES_MAX_HI", 64)
    monkeypatch.setattr(ab, "_RESIDENT_SITES_MAX", 64)
    cfg = PhyloformerConfig(n_blocks=2, matmul_precision="float32")
    params = init_params(jax.random.PRNGKey(7), cfg)
    b, n, l = 1, 8, 160
    rng = np.random.default_rng(2)
    codes = jnp.asarray(rng.integers(0, 20, size=(b, n, l)), jnp.int32)
    site_mask = jnp.asarray(np.arange(l)[None, :] < 131)
    seq_mask = jnp.asarray(np.arange(n)[None, :] < 7)
    want = forward(params, codes, cfg, site_mask=site_mask, seq_mask=seq_mask)
    got = forward_fused(params, codes, cfg, site_mask=site_mask,
                        seq_mask=seq_mask, interpret=True)
    from phyloformer_tpu.models.phyloformer import pair_mask_from_seq_mask
    pm = np.asarray(pair_mask_from_seq_mask(seq_mask, n))
    err = np.abs((np.asarray(got) - np.asarray(want)) * pm).max()
    assert err < 2e-4, f"max err {err}"


def test_fused_block_matches_xla_with_padding():
    """Padded sites and pairs must be exact no-ops on real outputs."""
    layer = _layer(3)
    b, p, l = 2, 30, 48
    real_p, real_l = 21, 37
    x = _rand_x(b, p, l, seed=5)
    site_mask = jnp.asarray(np.arange(l)[None, :] < real_l).repeat(b, 0)
    pair_mask = jnp.asarray(np.arange(p)[None, :] < real_p).repeat(b, 0)
    with jax.default_matmul_precision("float32"):
        want = axial_block(x, layer, CFG, site_mask, pair_mask)
        got = fused_axial_block(x, layer, site_mask, pair_mask, CFG.n_heads,
                                interpret=True)
    err = np.abs(
        np.asarray(got)[:, :real_p, :real_l] - np.asarray(want)[:, :real_p, :real_l]
    ).max()
    assert err < 2e-4, f"max err {err}"


def test_fused_forward_matches_reference_predictions(goldens_dir):
    """Full fused forward with imported pf.ckpt vs reference goldens."""
    from phyloformer_tpu.data import read_fasta
    from phyloformer_tpu.io import load_pretrained
    from phyloformer_tpu.models.phyloformer import (
        build_pairs,
        embed_alignment,
        pair_mask_from_seq_mask,
    )

    params, cfg, _ = load_pretrained("/root/reference/models/pf.ckpt")
    aln = read_fasta("/root/reference/data/testdata/msas/0_20_tips.fa")
    codes = jnp.asarray(aln.codes[None].astype(np.int32))
    site_mask = jnp.ones((1, aln.seq_len), bool)
    pair_mask = pair_mask_from_seq_mask(jnp.ones((1, aln.n_seqs), bool), aln.n_seqs)

    with jax.default_matmul_precision("float32"):
        x = build_pairs(embed_alignment(params, codes), aln.n_seqs)
        for layer in params["layers"]:
            x = fused_axial_block(x, layer, site_mask, pair_mask, cfg.n_heads,
                                  interpret=True)
        h = jax.nn.softplus(x @ params["head"]["w"] + params["head"]["b"])[..., 0]
        preds = jnp.mean(h, axis=-1)[0]

    g = np.load(goldens_dir / "pf_preds_testdata.npz")
    err = np.abs(np.asarray(preds) - g["0_20_tips"]).max()
    assert err < 1e-3, f"max err {err}"


@pytest.mark.parametrize("which", ["fused", "remat"])
def test_fused_block_custom_vjp_gradients(which):
    """Gradients through the fused block == gradients through the canonical
    XLA block — both the analytic fused backward kernels and the remat
    fallback."""
    from phyloformer_tpu.ops.pallas.autodiff import (
        fused_axial_block_ad,
        fused_axial_block_ad_remat,
    )

    block_ad = fused_axial_block_ad if which == "fused" else fused_axial_block_ad_remat
    layer = _layer(11)
    b, p, l = 1, 28, 40
    x = _rand_x(b, p, l, seed=9)
    site_mask = jnp.ones((b, l), bool)
    pair_mask = jnp.ones((b, p), bool)

    def loss_fused(x, layer):
        out = block_ad(x, layer, site_mask, pair_mask, CFG, True)
        return jnp.sum(out**2)

    def loss_ref(x, layer):
        with jax.default_matmul_precision("float32"):
            return jnp.sum(axial_block(x, layer, CFG, site_mask, pair_mask) ** 2)

    with jax.default_matmul_precision("float32"):
        v1, (gx1, gl1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, layer)
        v2, (gx2, gl2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, layer)
    assert float(v1) == pytest.approx(float(v2), rel=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=2e-3, rtol=1e-3)
    for a, b2 in zip(jax.tree_util.tree_leaves(gl1), jax.tree_util.tree_leaves(gl2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=2e-3, rtol=2e-3)


def test_ltiled_backward_matches_canonical_vjp(monkeypatch):
    """The L-tiled row backward (kernels E1/E2, site axes beyond VMEM
    residency) must replicate the canonical chain rule with ragged padded
    sites and pairs.  Forced by shrinking both residency thresholds so the
    forward residuals come from the L-tiled forward AND the backward runs
    E1/E2 (compiled-path parity at L=1536/2304 measured on the dev chip —
    docs/performance.md)."""
    import phyloformer_tpu.ops.pallas.axial_block as ab
    import phyloformer_tpu.ops.pallas.axial_block_bwd as bwd
    from phyloformer_tpu.ops.pallas.autodiff import fused_axial_block_ad

    monkeypatch.setattr(ab, "_RESIDENT_SITES_MAX_HI", 48)
    monkeypatch.setattr(bwd, "_BWD_RESIDENT_SITES_MAX", 48)
    # l=150 has no multiple-of-8 divisor <= 48, so this also exercises the
    # no-divisor fallback (site axis padded to a 48-tile multiple -> 4 site
    # tiles) — i.e. E1's cross-site-tile accumulation and E2's multi-tile
    # weight-grad accumulation run, with padded sites as exact no-ops.
    monkeypatch.setattr(bwd, "_BWD_LTILE_MAX", 48)

    layer = _layer(19)
    b, p = 2, 26
    l = 150  # > 48 -> L-tiled; ragged vs the site tile
    real_p, real_l = 23, 119
    x = _rand_x(b, p, l, seed=21)
    site_mask = jnp.asarray(np.arange(l)[None, :] < real_l).repeat(b, 0)
    pair_mask = jnp.asarray(np.arange(p)[None, :] < real_p).repeat(b, 0)
    rng = np.random.default_rng(29)
    g = jnp.asarray(rng.normal(size=(b, p, l, 64)).astype(np.float32))
    g = g * site_mask[:, None, :, None] * pair_mask[:, :, None, None]

    def loss_fused(x, layer):
        out = fused_axial_block_ad(x, layer, site_mask, pair_mask, CFG, True)
        return jnp.sum(out * g)

    def loss_ref(x, layer):
        with jax.default_matmul_precision("float32"):
            return jnp.sum(axial_block(x, layer, CFG, site_mask, pair_mask) * g)

    with jax.default_matmul_precision("float32"):
        v1, (gx1, gl1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, layer)
        v2, (gx2, gl2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, layer)
    assert float(v1) == pytest.approx(float(v2), rel=1e-4)
    m = np.asarray(site_mask[:, None, :, None] & pair_mask[:, :, None, None])
    np.testing.assert_allclose(np.asarray(gx1) * m, np.asarray(gx2) * m,
                               atol=2e-3, rtol=1e-3)
    for a, b2 in zip(jax.tree_util.tree_leaves(gl1), jax.tree_util.tree_leaves(gl2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=2e-3,
                                   rtol=2e-3)


def test_fused_backward_kernels_with_padding():
    """The analytic fused backward must replicate the canonical chain rule
    with padded sites AND padded pairs (masked-loss cotangents, zero-sum
    guards), parameter gradients included."""
    from phyloformer_tpu.ops.pallas.autodiff import fused_axial_block_ad

    layer = _layer(7)
    b, p, l = 2, 30, 48
    real_p, real_l = 21, 37
    x = _rand_x(b, p, l, seed=13)
    site_mask = jnp.asarray(np.arange(l)[None, :] < real_l).repeat(b, 0)
    pair_mask = jnp.asarray(np.arange(p)[None, :] < real_p).repeat(b, 0)
    rng = np.random.default_rng(17)
    g = jnp.asarray(rng.normal(size=(b, p, l, 64)).astype(np.float32))
    # a masked loss yields zero cotangent at padded positions
    g = g * site_mask[:, None, :, None] * pair_mask[:, :, None, None]

    def loss_fused(x, layer):
        out = fused_axial_block_ad(x, layer, site_mask, pair_mask, CFG, True)
        return jnp.sum(out * g)

    def loss_ref(x, layer):
        with jax.default_matmul_precision("float32"):
            return jnp.sum(axial_block(x, layer, CFG, site_mask, pair_mask) * g)

    with jax.default_matmul_precision("float32"):
        v1, (gx1, gl1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, layer)
        v2, (gx2, gl2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, layer)
    assert float(v1) == pytest.approx(float(v2), rel=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4, rtol=1e-4)
    for a, b2 in zip(jax.tree_util.tree_leaves(gl1), jax.tree_util.tree_leaves(gl2)):
        scale = max(np.abs(np.asarray(b2)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b2) / scale, atol=2e-5
        )


def test_fused_block_other_architecture():
    """Kernels are shape-generic: d=32, H=2 (non-default architecture)."""
    cfg = PhyloformerConfig(n_blocks=1, n_heads=2, embed_dim=32)
    params = init_params(jax.random.PRNGKey(5), cfg)
    layer = params["layers"][0]
    b, p, l = 2, 21, 48
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(b, p, l, 32)).astype(np.float32))
    site_mask = jnp.ones((b, l), bool)
    pair_mask = jnp.ones((b, p), bool)
    with jax.default_matmul_precision("float32"):
        want = axial_block(x, layer, cfg, site_mask, pair_mask)
        got = fused_axial_block(x, layer, site_mask, pair_mask, cfg.n_heads,
                                interpret=True)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-4


@pytest.mark.parametrize("ltiled", [False, True])
def test_sharded_fused_forward_matches_xla(ltiled, monkeypatch):
    """Multi-chip fused inference (kernel A per pair shard + stats psum +
    kernel B local, under shard_map) == the XLA fp32 forward, on the
    8-device virtual mesh with padded sites AND sequences.  The ``ltiled``
    variant shrinks the residency thresholds so the shard-local forward
    runs the L-tiled A1/A2 + L-tiled kernel B (no site cap on the sharded
    path either)."""
    from phyloformer_tpu.models.params import init_params
    from phyloformer_tpu.models.phyloformer import (
        forward,
        pair_mask_from_seq_mask,
    )
    from phyloformer_tpu.ops.pallas.sharded import forward_fused_sharded
    from phyloformer_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    if ltiled:
        import phyloformer_tpu.ops.pallas.axial_block as ab

        monkeypatch.setattr(ab, "_RESIDENT_SITES_MAX_HI", 16)
        monkeypatch.setattr(ab, "_RESIDENT_SITES_MAX", 16)
        monkeypatch.setattr(ab, "_LTILE", 32)
    cfg = PhyloformerConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=2, pair=4)
    rng = np.random.default_rng(1)
    b, n, l = 2, 17, 48  # P = 136 -> pair shards of 34
    codes = jnp.asarray(rng.integers(0, 20, (b, n, l)), jnp.int32)
    site_mask = jnp.asarray(np.arange(l)[None] < 41).repeat(b, 0)
    seq_mask = jnp.asarray(np.arange(n)[None] < 15).repeat(b, 0)

    with jax.default_matmul_precision("float32"):
        want = np.asarray(
            forward(params, codes, cfg, site_mask=site_mask, seq_mask=seq_mask)
        )
        got = np.asarray(
            forward_fused_sharded(
                params, codes, cfg, mesh, site_mask=site_mask,
                seq_mask=seq_mask, interpret=True,
            )
        )
    p = n * (n - 1) // 2
    pm = np.asarray(pair_mask_from_seq_mask(seq_mask, n))
    err = np.abs(got[:, :p] - want)[pm].max()
    assert err < 5e-4, f"max err {err}"


def test_sharded_engine_pallas_path():
    """ShardedInferenceEngine with use_pallas routes through the shard_map
    fused forward and agrees with a single-device engine."""
    from phyloformer_tpu.data.fasta import Alignment
    from phyloformer_tpu.infer.engine import (
        InferenceConfig,
        InferenceEngine,
        ShardedInferenceEngine,
    )
    from phyloformer_tpu.models.params import init_params
    from phyloformer_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = PhyloformerConfig(n_blocks=2)
    params = init_params(jax.random.PRNGKey(3), cfg)
    mesh = make_mesh(data=2, pair=4)
    rng = np.random.default_rng(5)
    alns = [
        Alignment(codes=rng.integers(0, 20, (12 - (i % 2), 30 + i)).astype(np.int8),
                  ids=[f"T{j}" for j in range(12 - (i % 2))])
        for i in range(4)
    ]
    icfg = InferenceConfig(n_buckets=(12,), l_buckets=(40,), use_pallas=True)
    got = ShardedInferenceEngine(params, cfg, mesh, icfg).predict(alns)
    want = InferenceEngine(
        params, cfg, InferenceConfig(n_buckets=(12,), l_buckets=(40,))
    ).predict(alns)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, atol=5e-4)
