"""The Phyloformer network as pure-functional JAX.

Forward semantics replicate `/root/reference/phyloformer/model.py:166-187`
exactly (embedding → pair build → 6 axial blocks → softplus head → site mean),
re-designed TPU-first:

- canonical layout is channel-last ``(B, P, L, d)`` (the reference shuffles a
  channel-first ``(B, d, P, L)`` through 4+ permutes per block);
- the input is integer codes ``(B, n, L)``; the reference's one-hot ⊗ 1x1-conv
  embedding is an equivalent table lookup (22× less H2M traffic);
- the reference's materialized ``(P, n)`` seq2pair matmul
  (``model.py:8-39,175``) is an equivalent gather-add
  ``pair[k] = emb[i_k] + emb[j_k]``;
- optional boolean masks make padded sites/sequences exact no-ops, enabling
  the bucketed batched inference the reference never shipped
  (`/root/reference/infer_alns.py:28-33` is dead code);
- everything is jit-able with static shapes; per-block remat is available for
  long-sequence training.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pairs import pair_indices
from ..ops.attention import layer_norm, scaled_linear_attention
from .params import Params, PhyloformerConfig


def _dropout(x: jax.Array, rate: float, key: Optional[jax.Array]) -> jax.Array:
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def embed_alignment(params: Params, codes: jax.Array) -> jax.Array:
    """One-hot ⊗ Conv1x1(22→d) + ReLU as a table lookup: ``(B, n, L) → (B, n, L, d)``.

    Equals `/root/reference/phyloformer/model.py:138-143,173` on one-hot input.
    """
    w, b = params["embed"]["w"], params["embed"]["b"]
    return jax.nn.relu(jnp.take(w, codes, axis=0) + b)


def build_pairs(emb: jax.Array, n_seqs: int) -> jax.Array:
    """Gather-add pair representation: ``(B, n, L, d) → (B, P, L, d)``.

    ``pair[k] = emb[i_k] + emb[j_k]`` in upper-triangle order — the exact
    arithmetic of the reference's seq2pair matmul
    (`/root/reference/phyloformer/model.py:175`).
    """
    i_idx, j_idx = pair_indices(n_seqs)
    i_idx = jnp.asarray(i_idx)
    j_idx = jnp.asarray(j_idx)
    return jnp.take(emb, i_idx, axis=1) + jnp.take(emb, j_idx, axis=1)


def axial_block(
    x: jax.Array,
    layer: Dict[str, Any],
    cfg: PhyloformerConfig,
    site_mask: Optional[jax.Array],
    pair_mask: Optional[jax.Array],
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """One Phyloformer layer on ``(B, P, L, d)``.

    Row attention mixes across sites (L) within each pair; column attention
    mixes across pairs (P) at each site; then a 4× GELU FFN. Pre-LN residual
    throughout (`/root/reference/phyloformer/model.py:87-106`).
    """
    keys = (
        jax.random.split(dropout_key, 4) if dropout_key is not None else [None] * 4
    )
    row_mask = site_mask[:, None, :] if site_mask is not None else None  # (B,1,L)
    col_mask = pair_mask[:, None, :] if pair_mask is not None else None  # (B,1,P)

    # Row attention over L: x is already (..., L, d).
    h = layer_norm(x, **layer["row_norm"], eps=cfg.ln_eps)
    h = scaled_linear_attention(h, layer["row_attn"], cfg.n_heads, mask=row_mask)
    x = x + _dropout(h, cfg.dropout, keys[0])

    # Column attention over P: swap (P, L) -> attend -> swap back.
    h = layer_norm(x, **layer["col_norm"], eps=cfg.ln_eps)
    h = jnp.swapaxes(h, 1, 2)  # (B, L, P, d)
    h = scaled_linear_attention(h, layer["col_attn"], cfg.n_heads, mask=col_mask)
    h = jnp.swapaxes(h, 1, 2)
    x = x + _dropout(h, cfg.dropout, keys[1])

    # FFN: 1x1 convs are per-token matmuls in channel-last layout.
    h = layer_norm(x, **layer["ffn_norm"], eps=cfg.ln_eps)
    h = h @ layer["ffn"]["w1"] + layer["ffn"]["b1"]
    h = _dropout(h, cfg.dropout, keys[2])
    h = jax.nn.gelu(h, approximate=False)
    h = h @ layer["ffn"]["w2"] + layer["ffn"]["b2"]
    x = x + _dropout(h, cfg.dropout, keys[3])
    return x


def forward(
    params: Params,
    codes: jax.Array,
    cfg: PhyloformerConfig,
    site_mask: Optional[jax.Array] = None,
    seq_mask: Optional[jax.Array] = None,
    dropout_key: Optional[jax.Array] = None,
    remat: bool = False,
    act_sharding=None,
) -> jax.Array:
    """Predict pairwise evolutionary distances.

    Args:
      params: model parameter pytree (:mod:`.params`).
      codes: ``(B, n, L)`` int8/int32 alignment codes (padded to bucket shape).
      cfg: static architecture config.
      site_mask: optional bool ``(B, L)``; False = padded site.
      seq_mask: optional bool ``(B, n)``; False = padded sequence. Pair mask is
        derived as ``seq_mask[i] & seq_mask[j]``.
      dropout_key: PRNG key enables dropout (training); None = deterministic.
      remat: rematerialize each axial block (trade FLOPs for activation HBM).
      act_sharding: optional ``NamedSharding`` for the ``(B, P, L, d)``
        activations (e.g. batch over 'data', pair axis over 'pair'); the
        constraint is re-asserted after every block so XLA keeps the layout
        and inserts exact psum reductions for the pair-axis attention sums.

    Returns:
      ``(B, P)`` nonnegative distances, ``P = n*(n-1)/2``, upper-triangle order.
      Padded pairs yield garbage — mask with ``pair_mask_from_seq_mask``.
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _forward_impl(
            params, codes, cfg, site_mask, seq_mask, dropout_key, remat, act_sharding
        )


def _forward_impl(
    params: Params,
    codes: jax.Array,
    cfg: PhyloformerConfig,
    site_mask: Optional[jax.Array],
    seq_mask: Optional[jax.Array],
    dropout_key: Optional[jax.Array],
    remat: bool,
    act_sharding=None,
) -> jax.Array:
    n_seqs = codes.shape[1]

    def constrain(t):
        if act_sharding is not None:
            return jax.lax.with_sharding_constraint(t, act_sharding)
        return t

    emb = embed_alignment(params, codes)  # (B, n, L, d)
    x = constrain(build_pairs(emb, n_seqs))  # (B, P, L, d)

    pair_mask = pair_mask_from_seq_mask(seq_mask, n_seqs) if seq_mask is not None else None

    block = axial_block
    if remat:
        block = jax.checkpoint(axial_block, static_argnums=(2,))

    keys = (
        jax.random.split(dropout_key, cfg.n_blocks + 1)
        if dropout_key is not None
        else [None] * (cfg.n_blocks + 1)
    )
    for i, layer in enumerate(params["layers"]):
        x = constrain(block(x, layer, cfg, site_mask, pair_mask, keys[i]))

    # Head: Conv1x1(d→1) + Softplus, then mean over (real) sites.
    h = x @ params["head"]["w"] + params["head"]["b"]  # (B, P, L, 1)
    h = _dropout(h, cfg.dropout, keys[-1])
    h = jax.nn.softplus(h)[..., 0]  # (B, P, L)
    if site_mask is not None:
        m = site_mask[:, None, :].astype(h.dtype)
        return jnp.sum(h * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    return jnp.mean(h, axis=-1)


def pair_mask_from_seq_mask(seq_mask: jax.Array, n_seqs: int) -> jax.Array:
    """``(B, n)`` sequence mask → ``(B, P)`` pair mask."""
    i_idx, j_idx = pair_indices(n_seqs)
    return jnp.take(seq_mask, jnp.asarray(i_idx), axis=1) & jnp.take(
        seq_mask, jnp.asarray(j_idx), axis=1
    )


@partial(jax.jit, static_argnames=("cfg", "remat"))
def forward_jit(params, codes, cfg: PhyloformerConfig, site_mask=None, seq_mask=None, remat: bool = False):
    return forward(params, codes, cfg, site_mask=site_mask, seq_mask=seq_mask, remat=remat)


def forward_fused(
    params: Params,
    codes: jax.Array,
    cfg: PhyloformerConfig,
    site_mask: Optional[jax.Array] = None,
    seq_mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Inference forward using the fused Pallas axial-block kernels
    (:mod:`phyloformer_tpu.ops.pallas`). Same numerics as :func:`forward`
    in deterministic mode; ~4 HBM passes per block instead of ~15.

    There is no site cap: up to L=2048 the row kernel keeps the full site
    axis resident in VMEM (long alignments shrink the pair tile — a leading,
    tiling-unconstrained block dim); beyond that the two-pass L-tiled
    kernels take over (row sums accumulated across site tiles, the same
    running-sum trick the pair axis uses — :mod:`.ops.pallas.axial_block`).
    Setting ``PF_PALLAS_MAX_SITES`` > 0 restores the XLA fallback above
    that length (escape hatch)."""
    import os as _os

    from ..ops.pallas import fused_axial_block

    max_sites = int(_os.environ.get("PF_PALLAS_MAX_SITES", "0"))
    if max_sites > 0 and codes.shape[2] > max_sites and not interpret:
        return forward(params, codes, cfg, site_mask=site_mask, seq_mask=seq_mask)

    b, n_seqs, seq_len = codes.shape
    if site_mask is None:
        site_mask = jnp.ones((b, seq_len), bool)
    if seq_mask is None:
        seq_mask = jnp.ones((b, n_seqs), bool)
    pair_mask = pair_mask_from_seq_mask(seq_mask, n_seqs)

    mxu_precision = "highest" if cfg.matmul_precision == "float32" else "default"
    with jax.default_matmul_precision(cfg.matmul_precision):
        emb = embed_alignment(params, codes)
        x = build_pairs(emb, n_seqs)
        for layer in params["layers"]:
            x = fused_axial_block(
                x, layer, site_mask, pair_mask, cfg.n_heads, cfg.ln_eps, interpret,
                mxu_precision,
            )
        h = x @ params["head"]["w"] + params["head"]["b"]
        h = jax.nn.softplus(h)[..., 0]
        m = site_mask[:, None, :].astype(h.dtype)
        return jnp.sum(h * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)
