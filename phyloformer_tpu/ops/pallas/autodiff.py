"""Differentiable wrapper for the fused Pallas axial block.

Forward runs the fused kernels (:mod:`.axial_block`); backward re-traces the
canonical XLA implementation (`models/phyloformer.py:axial_block`) and
differentiates through it — rematerialization semantics: no intermediate
activations are stored, the backward recomputes them, and gradients are
exactly the canonical gradients (the two forwards agree to fp32 tolerance).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax

from .axial_block import fused_axial_block


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
    out = fused_axial_block_ad(
        x, layer, site_mask, pair_mask, cfg, interpret, mxu_precision
    )
    return out, (x, layer, site_mask, pair_mask)


def _bwd(cfg, interpret, mxu_precision, residuals, g):
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


fused_axial_block_ad.defvjp(_fwd, _bwd)
