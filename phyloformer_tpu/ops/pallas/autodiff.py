"""Differentiable wrappers for the fused Pallas axial block.

Two custom-VJP flavors:

- :func:`fused_axial_block_ad` — **fully fused**: forward runs the fused
  kernels and keeps the residuals they already produce (block input ``x``,
  post-row-attention ``x1``, column sums ``stats``); backward runs the
  analytic fused backward kernels (:mod:`.axial_block_bwd`).  No forward
  recompute, ~7 HBM passes per block backward vs ~30+ for the XLA autodiff
  of the canonical block.
- :func:`fused_axial_block_ad_remat` — the round-1 fallback: forward fused,
  backward re-traces the canonical XLA implementation
  (`models/phyloformer.py:axial_block`) and differentiates through it
  (rematerialization: one extra forward, exact canonical gradients).  Kept
  for A/B comparison and as the safety escape hatch
  (``PF_PALLAS_BWD=remat``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax

from .axial_block import fused_axial_block, fused_axial_block_res
from .axial_block_bwd import fused_axial_block_bwd


# ---------------------------------------------------------------------------
# Fully fused forward + backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_axial_block_ad(
    x, layer: Dict[str, Any], site_mask, pair_mask,
    cfg, interpret: bool = False, mxu_precision: str = "highest",
):
    return fused_axial_block(
        x, layer, site_mask, pair_mask, cfg.n_heads, cfg.ln_eps, interpret,
        mxu_precision,
    )


def _fwd(x, layer, site_mask, pair_mask, cfg, interpret, mxu_precision):
    x3, x1, stats = fused_axial_block_res(
        x, layer, site_mask, pair_mask, cfg.n_heads, cfg.ln_eps, interpret,
        mxu_precision,
    )
    return x3, (x, x1, stats, layer, site_mask, pair_mask)


def _bwd(cfg, interpret, mxu_precision, residuals, g):
    x, x1, stats, layer, site_mask, pair_mask = residuals
    gx, dlayer = fused_axial_block_bwd(
        x, x1, stats, g, layer, site_mask, pair_mask,
        cfg.n_heads, cfg.ln_eps, interpret, mxu_precision,
    )
    return gx, dlayer, None, None


fused_axial_block_ad.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Remat fallback (round-1 behavior)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_axial_block_ad_remat(
    x, layer: Dict[str, Any], site_mask, pair_mask,
    cfg, interpret: bool = False, mxu_precision: str = "highest",
):
    return fused_axial_block(
        x, layer, site_mask, pair_mask, cfg.n_heads, cfg.ln_eps, interpret,
        mxu_precision,
    )


def _fwd_remat(x, layer, site_mask, pair_mask, cfg, interpret, mxu_precision):
    out = fused_axial_block_ad_remat(
        x, layer, site_mask, pair_mask, cfg, interpret, mxu_precision
    )
    return out, (x, layer, site_mask, pair_mask)


def _bwd_remat(cfg, interpret, mxu_precision, residuals, g):
    from ...models.phyloformer import axial_block

    x, layer, site_mask, pair_mask = residuals

    def ref_block(x_, layer_):
        with jax.default_matmul_precision(
            "float32" if mxu_precision in ("highest", "float32") else "default"
        ):
            return axial_block(x_, layer_, cfg, site_mask, pair_mask)

    _, vjp = jax.vjp(ref_block, x, layer)
    dx, dlayer = vjp(g)
    return dx, dlayer, None, None


fused_axial_block_ad_remat.defvjp(_fwd_remat, _bwd_remat)
