"""Fused Pallas TPU *backward* kernels for the Phyloformer axial block.

Round 1 shipped a remat-style custom VJP (backward re-traced the canonical
XLA block), which pays one extra forward per block — fused training measured
609 ms/step vs 367 ms for the XLA path.  These kernels compute the analytic
gradients of one block directly, consuming residuals the fused forward
already produces (``x`` = block input, ``x1`` = post-row-attention
activations, ``colstats`` = the pair-axis running sums Σk/Σq/Σk·v), so the
backward pays **zero** forward recompute beyond cheap in-tile LN/projection
re-evaluation:

- **Kernel C** (grid ``B x P-tiles``): from ``x1`` + colstats it recomputes
  ``x2`` (column-attention output) and the FFN internals, backprops the FFN
  sub-block (``g2 = dL/dx2``), forms ``d_attn = g2 @ Wo_cᵀ`` and accumulates
  the single cross-pair coupling term of the column-attention backward,
  ``A1[l, dim] = Σ_p d_attn ⊙ qn`` (everything else in the column backward
  is derivable per site from A1 — see ``_derive_col_site_grads``).  Emits
  ``g2``, ``A1``, and the FFN + column-out-projection weight gradients.
- **Kernel E** (grid ``B x P-tiles``): finalizes the column-attention
  backward per tile (``g1 = dL/dx1``) and runs the complete row-attention
  backward (tile-resident site axis, the same VMEM regime as forward kernel
  A), emitting ``gx = dL/dx`` and all remaining weight gradients.

Weight gradients accumulate across grid steps in VMEM-resident output
blocks (constant index maps).  Numerics replicate the exact chain rule of
:func:`phyloformer_tpu.models.phyloformer.axial_block` (reference semantics:
`/root/reference/phyloformer/attention.py:160-197`, `model.py:87-106`)
including the zero-sum guards (``where(s > 0, s, 1)`` passes gradient only
where the raw sum was positive); validated against ``jax.vjp`` of the
canonical block in ``tests/test_pallas_kernels.py``.

There is no training site cap: kernel E holds the full site axis per pair
tile in VMEM up to ``_BWD_RESIDENT_SITES_MAX`` (1024), and beyond that the
two-pass L-tiled pair **E1/E2** takes over (E1 accumulates the per-pair
sums Σq/Σk/Σk·v/Σ(d_attn⊙q) across site tiles; E2 finalizes per tile) —
mirroring the forward's A1/A2 split in :mod:`.axial_block`.  Setting
``PF_PALLAS_TRAIN_MAX_SITES`` > 0 restores an XLA fallback above that
length (escape hatch; default 0 = uncapped).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .axial_block import _erf, _expand_heads, _phi

_INV_SQRT2PI = 0.3989422804014327

# Longest site axis kernel E keeps VMEM-resident per pair tile (verified
# compiling at pt=1 on the dev chip); beyond it the L-tiled E1/E2 pair
# takes over, removing the training site cap.
_BWD_RESIDENT_SITES_MAX = 1024

# Upper bound of the site-tile divisor search for the L-tiled backward
# kernels (C/D and E1/E2); lengths with no multiple-of-8 divisor below it
# are padded to a tile multiple instead.
_BWD_LTILE_MAX = 320


def _gelu_grad(u):
    # d/du [u * Phi(u)] = Phi(u) + u * pdf(u); exact-gelu derivative with the
    # rational erf (Mosaic lowers neither erf nor erfc).
    cdf = 0.5 * (1.0 + _erf(u * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * u * u) * _INV_SQRT2PI
    return cdf + u * pdf


def _phi_grad(z):
    # φ(z) = elu(z) + 1  ⇒  φ'(z) = 1 (z > 0) else exp(z).
    return jnp.where(z > 0, 1.0, jnp.exp(jnp.minimum(z, 0.0)))


def _ln_fwd(x, scale, bias, eps):
    """LayerNorm forward returning (h, xhat, r) for reuse in the backward."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * r
    return xhat * scale + bias, xhat, r


def _ln_bwd(dh, xhat, r, scale):
    """LayerNorm backward: dx given upstream dh, plus the per-tile
    (dscale, dbias) partial sums (reduced over all leading axes)."""
    gxh = dh * scale
    dx = r * (
        gxh
        - jnp.mean(gxh, axis=-1, keepdims=True)
        - xhat * jnp.mean(gxh * xhat, axis=-1, keepdims=True)
    )
    dscale = jnp.sum((dh * xhat).reshape(-1, dh.shape[-1]), axis=0, keepdims=True)
    dbias = jnp.sum(dh.reshape(-1, dh.shape[-1]), axis=0, keepdims=True)
    return dx, dscale, dbias


def _contract_heads(t, n_heads: int, interpret: bool,
                    prec=jax.lax.Precision.HIGHEST):
    """(..., d) -> (..., H): sum each head's value block (adjoint of
    ``axial_block._expand_heads``), as a matmul with the 0/1 matrix."""
    d = t.shape[-1]
    if interpret:
        return t.reshape(t.shape[:-1] + (n_heads, d // n_heads)).sum(-1)
    hd = d // n_heads
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 0) // hd
    head_col = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 1)
    contract = (head_of_lane == head_col).astype(t.dtype)  # (d, H)
    # prec follows the kernel's matmul precision — see _expand_heads.
    flat = jnp.dot(t.reshape(-1, d), contract, precision=prec,
                   preferred_element_type=jnp.float32)
    return flat.reshape(t.shape[:-1] + (n_heads,))


def _mm(a, w, prec, b=None):
    out = jnp.dot(a.reshape(-1, a.shape[-1]), w, precision=prec,
                  preferred_element_type=jnp.float32).reshape(
                      a.shape[:-1] + (w.shape[-1],))
    return out if b is None else out + b


def _mm_at(a, b, prec):
    """aᵀ @ b for (N, K), (N, M) -> (K, M): the weight-gradient matmul."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def _derive_col_site_grads(stats, a1, n_pairs, d, n_heads, interpret, prec):
    """Per-site pieces of the column-attention backward, all derivable from
    the forward colstats and the accumulated ``A1 = Σ_p d_attn ⊙ qn``.

    Returns head-expanded (L, d) tensors ``qm_e``, ``ctx_e``, ``d_skv_e``
    and (L, H) tensors ``d_sk_H``, ``d_sq_H``.
    """
    hd = d // n_heads
    sk_raw = stats[:, :d]
    sq_raw = stats[:, d:2 * d]
    kv = stats[:, 2 * d:]
    qm_raw = sq_raw / n_pairs
    qm_e = jnp.where(qm_raw > 0, qm_raw, 1.0)
    sk_e = jnp.where(sk_raw > 0, sk_raw, 1.0)
    ctx_e = kv / sk_e

    # d_ctx = A1 by definition of A1; ctx = Σk·v / Σk:
    d_skv_e = a1 / sk_e
    sk_H = _contract_heads(sk_e, n_heads, interpret, prec) / hd
    d_sk_H = -_contract_heads(a1 * ctx_e, n_heads, interpret, prec) / sk_H
    d_sk_H = d_sk_H * (_contract_heads(sk_raw, n_heads, interpret, prec) > 0)

    # qn = q / qm with qm = Σq / Π:  d_qm = -(1/qm²) Σ_p d_qn_H ⊙ q_H, and
    # Σ_p d_qn_e ⊙ q_e = ctx ⊙ qm ⊙ A1  (since A1 = Σ_p (d_attn ⊙ q) / qm
    # and d_qn_e = d_attn ⊙ ctx).
    qm_H = _contract_heads(qm_e, n_heads, interpret, prec) / hd
    d_qm_H = -_contract_heads(ctx_e * qm_e * a1, n_heads, interpret, prec) / (qm_H * qm_H)
    d_qm_H = d_qm_H * (_contract_heads(qm_raw, n_heads, interpret, prec) > 0)
    d_sq_H = d_qm_H / n_pairs
    return qm_e, ctx_e, d_skv_e, d_sk_H, d_sq_H


# ---------------------------------------------------------------------------
# Kernel C: FFN backward + column-attention d_attn / A1 accumulation
# ---------------------------------------------------------------------------
#
# Everything in kernel C is per-(pair, site) local (the row attention lives
# in kernel E), so the site axis is tiled too: grid (B, L-tiles, P-tiles)
# with the pair axis innermost so the per-(batch, L-tile) A1 accumulator
# block stays VMEM-resident across consecutive grid steps.  Computation is
# ordered so at most two of the 4d-wide FFN temporaries are live at once
# (the first compile attempt exceeded the 16 MiB scoped-VMEM limit by 21 KB).

def _kernel_c(
    # inputs
    x1_ref, g3_ref, stats_ref, pair_mask_ref, pair_count_ref,
    cn_s_ref, cn_b_ref, cwq_ref, cbq_ref, cwo_t_ref, cbo_ref,
    fn_s_ref, fn_b_ref, fw1_ref, fb1_ref, fw1_t_ref, fw2_t_ref,
    # outputs
    g2_ref, a1_ref,
    dcwo_ref, dcbo_ref, dfn_s_ref, dfn_b_ref,
    dfw1_ref, dfb1_ref, dfw2_ref, dfb2_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    pt_i = pl.program_id(2)
    x1 = x1_ref[0]  # (Pt, Lt, d)
    g3 = g3_ref[0]
    ptile, L, d = x1.shape
    hd = d // n_heads
    pmask = pair_mask_ref[0].astype(x1.dtype)  # (Pt, 1, 1)
    stats = stats_ref[0]  # (Lt, 3d) raw Σk | Σq | Σk·v (head-expanded)
    n_pairs = jnp.maximum(pair_count_ref[pl.program_id(0), 0], 1.0)

    # --- recompute the column-attention output (forward kernel B math)
    sk_raw = stats[:, :d]
    sq_raw = stats[:, d:2 * d]
    kv = stats[:, 2 * d:]
    qm_e = jnp.where(sq_raw / n_pairs > 0, sq_raw / n_pairs, 1.0)
    sk_e = jnp.where(sk_raw > 0, sk_raw, 1.0)
    ctx_e = kv / sk_e  # (Lt, d)

    hc = _ln_fwd(x1, cn_s_ref[:], cn_b_ref[:], eps)[0]
    zq_H = _mm(hc, cwq_ref[:], prec, cbq_ref[:])
    qn = (_expand_heads(_phi(zq_H), hd, interpret, prec) * pmask) / qm_e[None]
    attn = qn * ctx_e[None]  # (Pt, Lt, d)

    # x2 = x1 + attn @ Wo_c + bo_c; only Wo_cᵀ is passed — contract its
    # second axis to apply the untransposed weight.
    attn2 = attn.reshape(-1, d)
    attn_out = jax.lax.dot_general(
        attn2, cwo_t_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    ).reshape(attn.shape)
    x2 = x1 + attn_out + cbo_ref[:]

    # --- FFN forward recompute + backward (liveness-minimizing order: dfw2
    # right after `a` so it dies before d_a/du exist; du consumes u next)
    hf, xhat_f, r_f = _ln_fwd(x2, fn_s_ref[:], fn_b_ref[:], eps)
    u = _mm(hf, fw1_ref[:], prec, fb1_ref[:])
    a = 0.5 * u * (1.0 + _erf(u * 0.7071067811865476))  # exact-gelu forward
    g3f = g3.reshape(-1, d)
    dfw2 = _mm_at(a.reshape(-1, a.shape[-1]), g3f, prec)
    dfb2 = jnp.sum(g3f, axis=0, keepdims=True)
    du = _mm(g3, fw2_t_ref[:], prec) * _gelu_grad(u)
    d_hf = _mm(du, fw1_t_ref[:], prec)  # du @ W1ᵀ
    dfw1 = _mm_at(hf.reshape(-1, d), du.reshape(-1, du.shape[-1]), prec)
    dfb1 = jnp.sum(du.reshape(-1, du.shape[-1]), axis=0, keepdims=True)
    d_x2_ln, dfs, dfb = _ln_bwd(d_hf, xhat_f, r_f, fn_s_ref[:])
    g2 = g3 + d_x2_ln
    g2_ref[0] = g2

    # --- column d_attn and the cross-pair coupling sum A1
    g2f = g2.reshape(-1, d)
    dcwo = _mm_at(attn2, g2f, prec)
    dcbo = jnp.sum(g2f, axis=0, keepdims=True)
    d_attn = _mm(g2, cwo_t_ref[:], prec)  # g2 @ Wo_cᵀ
    a1_part = jnp.sum(d_attn * qn, axis=0)  # (Lt, d)

    first = jnp.logical_and(
        jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
        pt_i == 0,
    )

    @pl.when(pt_i == 0)
    def _init_a1():
        a1_ref[0] = a1_part

    @pl.when(pt_i > 0)
    def _acc_a1():
        a1_ref[0] += a1_part

    @pl.when(first)
    def _init_w():
        dcwo_ref[:] = dcwo
        dcbo_ref[:] = dcbo
        dfn_s_ref[:] = dfs
        dfn_b_ref[:] = dfb
        dfw1_ref[:] = dfw1
        dfb1_ref[:] = dfb1
        dfw2_ref[:] = dfw2
        dfb2_ref[:] = dfb2

    @pl.when(jnp.logical_not(first))
    def _acc_w():
        dcwo_ref[:] += dcwo
        dcbo_ref[:] += dcbo
        dfn_s_ref[:] += dfs
        dfn_b_ref[:] += dfb
        dfw1_ref[:] += dfw1
        dfb1_ref[:] += dfb1
        dfw2_ref[:] += dfw2
        dfb2_ref[:] += dfb2


# ---------------------------------------------------------------------------
# Kernel D: column-attention backward finalize (per-site local => L-tiled)
# ---------------------------------------------------------------------------

def _kernel_d(
    # inputs
    x1_ref, g2_ref, stats_ref, a1_ref, pair_mask_ref, pair_count_ref,
    cn_s_ref, cn_b_ref, cwq_ref, cbq_ref, cwq_t_ref, cwk_ref, cbk_ref,
    cwk_t_ref, cwv_ref, cbv_ref, cwv_t_ref, cwo_t_ref,
    # outputs
    g1_ref,
    dcn_s_ref, dcn_b_ref, dcwq_ref, dcbq_ref, dcwk_ref, dcbk_ref,
    dcwv_ref, dcbv_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    x1 = x1_ref[0]  # (Pt, Lt, d)
    g2 = g2_ref[0]
    ptile, L, d = x1.shape
    hd = d // n_heads
    pmask = pair_mask_ref[0].astype(x1.dtype)  # (Pt, 1, 1)
    n_pairs = jnp.maximum(pair_count_ref[pl.program_id(0), 0], 1.0)

    def expand(t):
        return _expand_heads(t, hd, interpret, prec)

    def contract(t):
        return _contract_heads(t, n_heads, interpret, prec)

    qm_e, ctx_e, d_skv_e, d_sk_H, d_sq_H = _derive_col_site_grads(
        stats_ref[0], a1_ref[0], n_pairs, d, n_heads, interpret, prec)

    hc, xhat_c, r_c = _ln_fwd(x1, cn_s_ref[:], cn_b_ref[:], eps)
    zqc_H = _mm(hc, cwq_ref[:], prec, cbq_ref[:])
    zkc_H = _mm(hc, cwk_ref[:], prec, cbk_ref[:])
    kc_e = expand(_phi(zkc_H)) * pmask
    vc = _mm(hc, cwv_ref[:], prec, cbv_ref[:])

    d_attn = _mm(g2, cwo_t_ref[:], prec)  # (Pt, Lt, d) — g2 @ Wo_cᵀ
    # d_q: qn = q/qm, attn = qn ⊙ ctx  ⇒  d_qn_e = d_attn ⊙ ctx
    qm_H = contract(qm_e) / hd  # (Lt, H)
    d_qc_H = contract(d_attn * ctx_e[None]) / qm_H[None] + d_sq_H[None]
    d_zqc_H = d_qc_H * _phi_grad(zqc_H) * pmask
    # d_k: ctx = Σk·v / Σk  ⇒  per-tile terms from the per-site d_skv/d_sk
    d_kc_H = d_sk_H[None] + contract(d_skv_e[None] * vc)
    d_zkc_H = d_kc_H * _phi_grad(zkc_H) * pmask
    d_vc = d_skv_e[None] * kc_e

    hcf = hc.reshape(-1, d)
    dcwq = _mm_at(hcf, d_zqc_H.reshape(-1, n_heads), prec)
    dcbq = jnp.sum(d_zqc_H.reshape(-1, n_heads), axis=0, keepdims=True)
    dcwk = _mm_at(hcf, d_zkc_H.reshape(-1, n_heads), prec)
    dcbk = jnp.sum(d_zkc_H.reshape(-1, n_heads), axis=0, keepdims=True)
    dcwv = _mm_at(hcf, d_vc.reshape(-1, d), prec)
    dcbv = jnp.sum(d_vc.reshape(-1, d), axis=0, keepdims=True)

    d_hc = (
        _mm(d_zqc_H, cwq_t_ref[:], prec)
        + _mm(d_zkc_H, cwk_t_ref[:], prec)
        + _mm(d_vc, cwv_t_ref[:], prec)
    )
    d_x1_ln, dcs, dcb = _ln_bwd(d_hc, xhat_c, r_c, cn_s_ref[:])
    g1_ref[0] = g2 + d_x1_ln

    first = jnp.logical_and(
        jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
        pl.program_id(2) == 0,
    )

    @pl.when(first)
    def _init_w():
        dcn_s_ref[:] = dcs
        dcn_b_ref[:] = dcb
        dcwq_ref[:] = dcwq
        dcbq_ref[:] = dcbq
        dcwk_ref[:] = dcwk
        dcbk_ref[:] = dcbk
        dcwv_ref[:] = dcwv
        dcbv_ref[:] = dcbv

    @pl.when(jnp.logical_not(first))
    def _acc_w():
        dcn_s_ref[:] += dcs
        dcn_b_ref[:] += dcb
        dcwq_ref[:] += dcwq
        dcbq_ref[:] += dcbq
        dcwk_ref[:] += dcwk
        dcbk_ref[:] += dcbk
        dcwv_ref[:] += dcwv
        dcbv_ref[:] += dcbv


# ---------------------------------------------------------------------------
# Kernel E: row-attention backward (site axis resident per tile)
# ---------------------------------------------------------------------------

def _kernel_e(
    # inputs
    x_ref, g1_ref, site_mask_ref,
    rn_s_ref, rn_b_ref, rwq_ref, rbq_ref, rwq_t_ref, rwk_ref, rbk_ref,
    rwk_t_ref, rwv_ref, rbv_ref, rwv_t_ref, rwo_t_ref,
    # outputs
    gx_ref,
    drn_s_ref, drn_b_ref, drwq_ref, drbq_ref, drwk_ref, drbk_ref,
    drwv_ref, drbv_ref, drwo_ref, drbo_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    x = x_ref[0]  # (Pt, L, d)
    g1 = g1_ref[0]
    ptile, L, d = x.shape
    hd = d // n_heads
    smask = site_mask_ref[0].astype(x.dtype)  # (L, 1)

    def expand(t):
        return _expand_heads(t, hd, interpret, prec)

    def contract(t):
        return _contract_heads(t, n_heads, interpret, prec)
    h, xhat_r, r_r = _ln_fwd(x, rn_s_ref[:], rn_b_ref[:], eps)
    zq_H = _mm(h, rwq_ref[:], prec, rbq_ref[:])
    zk_H = _mm(h, rwk_ref[:], prec, rbk_ref[:])
    q_e = expand(_phi(zq_H)) * smask[None, :, :]
    k_e = expand(_phi(zk_H)) * smask[None, :, :]
    v = _mm(h, rwv_ref[:], prec, rbv_ref[:])

    count = jnp.maximum(jnp.sum(smask), 1.0)
    sq_raw = jnp.sum(q_e, axis=1, keepdims=True) / count  # (Pt, 1, d): q-mean
    sk_raw = jnp.sum(k_e, axis=1, keepdims=True)  # (Pt, 1, d)
    qm_r = jnp.where(sq_raw > 0, sq_raw, 1.0)
    sk_r = jnp.where(sk_raw > 0, sk_raw, 1.0)
    skv = jnp.sum(k_e * v, axis=1, keepdims=True)  # (Pt, 1, d)
    ctx_r = skv / sk_r  # (Pt, 1, d)
    qn_r = q_e / qm_r
    attn_r = qn_r * ctx_r  # (Pt, L, d)

    d_attn_r = _mm(g1, rwo_t_ref[:], prec)  # g1 @ Woᵀ
    # per-row reductions over the site axis
    d_ctx = jnp.sum(d_attn_r * qn_r, axis=1, keepdims=True)  # (Pt, 1, d)
    d_skv_r = d_ctx / sk_r
    sk_rH = contract(sk_r) / hd  # (Pt, 1, H)
    d_sk_rH = -contract(d_ctx * ctx_r) / sk_rH
    d_sk_rH = d_sk_rH * (contract(sk_raw) > 0)
    qm_rH = contract(qm_r) / hd
    d_qn_e = d_attn_r * ctx_r  # (Pt, L, d)
    d_qm_rH = -contract(jnp.sum(d_qn_e * q_e, axis=1, keepdims=True)) / (
        qm_rH * qm_rH)
    d_qm_rH = d_qm_rH * (contract(sq_raw) > 0)
    d_sq_rH = d_qm_rH / count  # q-mean: Sq was already divided by count

    d_q_H = contract(d_qn_e) / qm_rH + d_sq_rH
    d_zq_H = d_q_H * _phi_grad(zq_H) * smask[None, :, :1]
    d_k_H = d_sk_rH + contract(d_skv_r * v)
    d_zk_H = d_k_H * _phi_grad(zk_H) * smask[None, :, :1]
    d_v = d_skv_r * k_e

    d_h = (
        _mm(d_zq_H, rwq_t_ref[:], prec)
        + _mm(d_zk_H, rwk_t_ref[:], prec)
        + _mm(d_v, rwv_t_ref[:], prec)
    )
    d_x_ln, drs, drb = _ln_bwd(d_h, xhat_r, r_r, rn_s_ref[:])
    gx_ref[0] = g1 + d_x_ln

    hf_ = h.reshape(-1, d)
    g1f = g1.reshape(-1, d)
    drwq = _mm_at(hf_, d_zq_H.reshape(-1, n_heads), prec)
    drbq = jnp.sum(d_zq_H.reshape(-1, n_heads), axis=0, keepdims=True)
    drwk = _mm_at(hf_, d_zk_H.reshape(-1, n_heads), prec)
    drbk = jnp.sum(d_zk_H.reshape(-1, n_heads), axis=0, keepdims=True)
    drwv = _mm_at(hf_, d_v.reshape(-1, d), prec)
    drbv = jnp.sum(d_v.reshape(-1, d), axis=0, keepdims=True)
    drwo = _mm_at(attn_r.reshape(-1, d), g1f, prec)
    drbo = jnp.sum(g1f, axis=0, keepdims=True)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init_w():
        drn_s_ref[:] = drs
        drn_b_ref[:] = drb
        drwq_ref[:] = drwq
        drbq_ref[:] = drbq
        drwk_ref[:] = drwk
        drbk_ref[:] = drbk
        drwv_ref[:] = drwv
        drbv_ref[:] = drbv
        drwo_ref[:] = drwo
        drbo_ref[:] = drbo

    @pl.when(jnp.logical_not(first))
    def _acc_w():
        drn_s_ref[:] += drs
        drn_b_ref[:] += drb
        drwq_ref[:] += drwq
        drbq_ref[:] += drbq
        drwk_ref[:] += drwk
        drbk_ref[:] += drbk
        drwv_ref[:] += drwv
        drbv_ref[:] += drbv
        drwo_ref[:] += drwo
        drbo_ref[:] += drbo


# ---------------------------------------------------------------------------
# Kernels E1/E2: L-tiled row backward (site axes beyond VMEM residency)
# ---------------------------------------------------------------------------
#
# The row backward's only cross-site couplings are per-pair sums: the
# forward's Σq/Σk/Σk·v and the backward's d_ctx and d_qm reductions — and the
# latter two both factor through Σ_L (d_attn ⊙ q) because ctx and qm are
# per-pair constants (d_ctx = Σ d_attn⊙qn = Σ(d_attn⊙q)/qm;
# Σ d_qn_e⊙q_e = ctx ⊙ Σ(d_attn⊙q)).  So kernel E splits exactly like the
# forward's A1/A2: E1 accumulates the four per-pair d-vectors across site
# tiles; E2 recomputes the in-tile projections, finalizes every per-site
# gradient from the global sums, and emits gx + the weight gradients.

def _kernel_e1(
    x_ref, g1_ref, site_mask_ref,
    rn_s_ref, rn_b_ref, rwq_ref, rbq_ref, rwk_ref, rbk_ref,
    rwv_ref, rbv_ref, rwo_t_ref,
    rowsums_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    li = pl.program_id(2)
    x = x_ref[0]  # (Pt, Lt, d)
    g1 = g1_ref[0]
    d = x.shape[-1]
    hd = d // n_heads
    smask = site_mask_ref[0].astype(x.dtype)  # (Lt, 1)

    h = _ln_fwd(x, rn_s_ref[:], rn_b_ref[:], eps)[0]
    q_e = _expand_heads(_phi(_mm(h, rwq_ref[:], prec, rbq_ref[:])), hd,
                        interpret, prec) * smask[None, :, :]
    k_e = _expand_heads(_phi(_mm(h, rwk_ref[:], prec, rbk_ref[:])), hd,
                        interpret, prec) * smask[None, :, :]
    v = _mm(h, rwv_ref[:], prec, rbv_ref[:])
    d_attn_r = _mm(g1, rwo_t_ref[:], prec)

    part = jnp.concatenate(
        [
            jnp.sum(q_e, axis=1, keepdims=True),
            jnp.sum(k_e, axis=1, keepdims=True),
            jnp.sum(k_e * v, axis=1, keepdims=True),
            jnp.sum(d_attn_r * q_e, axis=1, keepdims=True),
        ],
        axis=-1,
    )  # (Pt, 1, 4d) — kept 4-D overall so the pair tile is a leading
    # (tiling-unconstrained) block dim even when it drops below 8

    @pl.when(li == 0)
    def _init():
        rowsums_ref[0] = part

    @pl.when(li > 0)
    def _acc():
        rowsums_ref[0] += part


def _kernel_e2(
    x_ref, g1_ref, rowsums_ref, site_mask_ref, site_count_ref,
    rn_s_ref, rn_b_ref, rwq_ref, rbq_ref, rwq_t_ref, rwk_ref, rbk_ref,
    rwk_t_ref, rwv_ref, rbv_ref, rwv_t_ref, rwo_t_ref,
    gx_ref,
    drn_s_ref, drn_b_ref, drwq_ref, drbq_ref, drwk_ref, drbk_ref,
    drwv_ref, drbv_ref, drwo_ref, drbo_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    x = x_ref[0]  # (Pt, Lt, d)
    g1 = g1_ref[0]
    d = x.shape[-1]
    hd = d // n_heads
    smask = site_mask_ref[0].astype(x.dtype)  # (Lt, 1)

    def expand(t):
        return _expand_heads(t, hd, interpret, prec)

    def contract(t):
        return _contract_heads(t, n_heads, interpret, prec)

    h, xhat_r, r_r = _ln_fwd(x, rn_s_ref[:], rn_b_ref[:], eps)
    zq_H = _mm(h, rwq_ref[:], prec, rbq_ref[:])
    zk_H = _mm(h, rwk_ref[:], prec, rbk_ref[:])
    q_e = expand(_phi(zq_H)) * smask[None, :, :]
    k_e = expand(_phi(zk_H)) * smask[None, :, :]
    v = _mm(h, rwv_ref[:], prec, rbv_ref[:])
    d_attn_r = _mm(g1, rwo_t_ref[:], prec)

    count = jnp.maximum(site_count_ref[pl.program_id(0), 0], 1.0)
    rs = rowsums_ref[0][:, 0, :]  # (Pt, 4d)
    sq_raw = rs[:, :d] / count  # q-mean, raw
    sk_raw = rs[:, d : 2 * d]
    skv = rs[:, 2 * d : 3 * d]
    sdq = rs[:, 3 * d :]  # Σ_L d_attn ⊙ q_e
    qm_r = jnp.where(sq_raw > 0, sq_raw, 1.0)  # (Pt, d)
    sk_r = jnp.where(sk_raw > 0, sk_raw, 1.0)
    ctx_r = skv / sk_r

    d_ctx = sdq / qm_r  # = Σ_L d_attn ⊙ qn
    d_skv_r = d_ctx / sk_r
    sk_rH = contract(sk_r) / hd  # (Pt, H)
    d_sk_rH = -contract(d_ctx * ctx_r) / sk_rH
    d_sk_rH = d_sk_rH * (contract(sk_raw) > 0)
    qm_rH = contract(qm_r) / hd
    d_qm_rH = -contract(ctx_r * sdq) / (qm_rH * qm_rH)
    d_qm_rH = d_qm_rH * (contract(sq_raw) > 0)
    d_sq_rH = d_qm_rH / count

    d_qn_e = d_attn_r * ctx_r[:, None, :]  # (Pt, Lt, d)
    d_q_H = contract(d_qn_e) / qm_rH[:, None, :] + d_sq_rH[:, None, :]
    d_zq_H = d_q_H * _phi_grad(zq_H) * smask[None, :, :1]
    d_k_H = d_sk_rH[:, None, :] + contract(d_skv_r[:, None, :] * v)
    d_zk_H = d_k_H * _phi_grad(zk_H) * smask[None, :, :1]
    d_v = d_skv_r[:, None, :] * k_e

    d_h = (
        _mm(d_zq_H, rwq_t_ref[:], prec)
        + _mm(d_zk_H, rwk_t_ref[:], prec)
        + _mm(d_v, rwv_t_ref[:], prec)
    )
    d_x_ln, drs, drb = _ln_bwd(d_h, xhat_r, r_r, rn_s_ref[:])
    gx_ref[0] = g1 + d_x_ln

    attn_r = (q_e / qm_r[:, None, :]) * ctx_r[:, None, :]
    hf_ = h.reshape(-1, d)
    g1f = g1.reshape(-1, d)
    drwq = _mm_at(hf_, d_zq_H.reshape(-1, n_heads), prec)
    drbq = jnp.sum(d_zq_H.reshape(-1, n_heads), axis=0, keepdims=True)
    drwk = _mm_at(hf_, d_zk_H.reshape(-1, n_heads), prec)
    drbk = jnp.sum(d_zk_H.reshape(-1, n_heads), axis=0, keepdims=True)
    drwv = _mm_at(hf_, d_v.reshape(-1, d), prec)
    drbv = jnp.sum(d_v.reshape(-1, d), axis=0, keepdims=True)
    drwo = _mm_at(attn_r.reshape(-1, d), g1f, prec)
    drbo = jnp.sum(g1f, axis=0, keepdims=True)

    first = jnp.logical_and(
        jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
        pl.program_id(2) == 0,
    )

    @pl.when(first)
    def _init_w():
        drn_s_ref[:] = drs
        drn_b_ref[:] = drb
        drwq_ref[:] = drwq
        drbq_ref[:] = drbq
        drwk_ref[:] = drwk
        drbk_ref[:] = drbk
        drwv_ref[:] = drwv
        drbv_ref[:] = drbv
        drwo_ref[:] = drwo
        drbo_ref[:] = drbo

    @pl.when(jnp.logical_not(first))
    def _acc_w():
        drn_s_ref[:] += drs
        drn_b_ref[:] += drb
        drwq_ref[:] += drwq
        drbq_ref[:] += drbq
        drwk_ref[:] += drwk
        drbk_ref[:] += drbk
        drwv_ref[:] += drwv
        drbv_ref[:] += drbv
        drwo_ref[:] += drwo
        drbo_ref[:] += drbo


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def _pick_tile_bwd(p: int, l: int, d: int, live_rows: int, floor: int = 4,
                   budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Pair-tile size for the backward kernels: like the forward
    ``_pick_tile`` but with a per-kernel live-buffer estimate (the backward
    keeps more (row, L, d)-sized tensors alive, incl. 4d-wide FFN temps).

    Unlike the forward's >=8 clamp, the pair tile here may drop to 2: it is
    a *leading* block dim, so TPU tiling constraints (which bind only the
    trailing (L, d) dims) don't apply — the masks are carried 4-D,
    ``(B, P, 1, 1)``, precisely so no mask block puts Pt in a constrained
    position.  Small tiles keep the full-site-axis row-backward kernel under
    the 16 MiB scoped-VMEM limit at L=256+ (pt=8 measured 694 KB over)."""
    per_row = l * d * 4 * live_rows
    pt = max(floor, budget_bytes // max(per_row, 1))
    pt = min(pt, p, 256)
    if pt >= 8:
        pt = (pt // 8) * 8
    elif pt >= 4:
        pt = 4
    elif pt >= 2:
        pt = 2
    else:
        pt = 1
    return pt


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "eps", "interpret", "mxu_precision",
                     "psum_axis"),
)
def fused_axial_block_bwd(
    x: jax.Array,
    x1: jax.Array,
    stats: jax.Array,
    g3: jax.Array,
    layer: Dict[str, Any],
    site_mask: jax.Array,
    pair_mask: jax.Array,
    n_heads: int = 4,
    eps: float = 1e-5,
    interpret: bool = False,
    mxu_precision: str = "highest",
    pair_count: Optional[jax.Array] = None,
    psum_axis: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Backward of one fused axial block.

    Args:
      x: ``(B, P, L, d)`` block input (forward residual).
      x1: ``(B, P, L, d)`` post-row-attention activations (forward residual).
      stats: ``(B, L, 3d)`` raw column sums Σk|Σq|Σk·v (forward residual).
      g3: ``(B, P, L, d)`` cotangent of the block output.
      layer / site_mask / pair_mask: as in the forward.
      pair_count: optional ``(B, 1)`` GLOBAL pair count override (multi-chip:
        the local mask only covers this shard's pairs).
      psum_axis: when running under ``shard_map`` with the pair axis sharded,
        the mesh axis over which to psum the cross-pair coupling sum A1
        between kernels C and D.  Weight gradients then come back as
        per-shard partials for the caller to psum.

    Returns:
      ``(gx, dlayer)`` — cotangents of ``x`` and of every entry of ``layer``.
    """
    prec = (
        jax.lax.Precision.HIGHEST
        if mxu_precision.lower() in ("highest", "float32")
        else jax.lax.Precision.DEFAULT
    )
    b, p, l, d = x.shape
    h = n_heads
    f = 4 * d  # FFN hidden width

    la = layer["row_attn"]
    ca = layer["col_attn"]
    ffn = layer["ffn"]

    if pair_count is None:
        pair_count = jnp.sum(pair_mask.astype(jnp.float32), axis=1)[:, None]

    # Kernel C is per-site local, so its site axis is tiled: the largest
    # multiple-of-8 divisor of l that is <= _BWD_LTILE_MAX (bucketed shapes
    # are multiples of 128, so this normally lands on 256 or the full
    # axis).  Lengths with no such divisor (e.g. odd l) are PADDED to a
    # tile multiple instead of keeping the whole axis resident — with the
    # site cap gone, lt = l would blow the VMEM scope at large l.  Padded
    # sites are exact no-ops: their cotangents/masks are zero, so every
    # backward contribution through them vanishes (verified by the ragged
    # L-tiled backward test).
    l_orig = l
    lt = l if l <= _BWD_LTILE_MAX else 0
    for cand in range(min(l, _BWD_LTILE_MAX), 7, -8):
        if l % cand == 0:
            lt = cand
            break
    if lt == 0:
        lt = min(256, -(-_BWD_LTILE_MAX // 8) * 8)
        l = -(-l // lt) * lt
        padl = ((0, 0), (0, 0), (0, l - l_orig), (0, 0))
        x = jnp.pad(x, padl)
        x1 = jnp.pad(x1, padl)
        g3 = jnp.pad(g3, padl)
        stats = jnp.pad(stats, ((0, 0), (0, l - l_orig), (0, 0)))
        site_mask = jnp.pad(site_mask, ((0, 0), (0, l - l_orig)))
    n_ltiles = l // lt

    # HIGHEST-precision (3-pass fp32) matmuls materialize extra temporaries:
    # kernel C measured 20.1 MB at pt=8/L=256 under HIGHEST vs fitting under
    # DEFAULT — halve the tile budgets in parity mode.
    hi = prec == jax.lax.Precision.HIGHEST
    # HIGHEST mode (3-pass matmuls incl. the expand/contract helpers)
    # measured 20.1 MB at pt=8/L=256 — halved tiles there; DEFAULT mode
    # compiles at pt=8 (expand/contract follow the kernel precision).
    # Env escape hatches (0 = auto): the scoped-VMEM fit is sensitive not
    # just to our block shapes but to XLA's surrounding layout choices —
    # small p_pad buckets have measured ~100 KB over the 16 MiB scope at
    # tile sizes that fit for large p_pad (round 3, n=10 training bucket).
    import os as _os

    def _env_tile(name: str) -> int:
        """Parse a tile override: must be 0 (auto) or a power of two.

        Powers of two keep the 'pt_pad is a multiple of every tile'
        invariant below (pt_pad = max(tiles, 8) only divides evenly when
        the tiles are powers of two); anything else would silently
        misalign the kernel grids."""
        raw = _os.environ.get(name, "0")
        try:
            v = int(raw)
        except ValueError:
            raise ValueError(
                f"{name}={raw!r}: expected an integer (0 = auto)") from None
        if v < 0 or (v & (v - 1)):
            raise ValueError(
                f"{name}={v}: tile override must be 0 (auto) or a power of "
                f"two so the shared pair padding divides every kernel tile")
        return v

    _env_pt_c = _env_tile("PF_PALLAS_BWD_PT_C")
    _env_pt_e = _env_tile("PF_PALLAS_BWD_PT_E")
    # Small-p buckets (training's n<=40 shapes) measured 103 KB over the
    # scope at pt_c=8/L=256 DEFAULT — XLA spills small custom-call outputs
    # into VMEM in those fusion contexts — while pt_c=4 compiles and runs
    # at every bucket (80-step on-chip probe, round 3).  Large p keeps the
    # round-2-measured pt_c=8.
    # Long-site buckets add a batch-scaled VMEM pin: XLA keeps the whole
    # (B, L, 3d) stats/grad-stats buffers in scope (same S(1) behavior the
    # forward pipeline accounts for) — the round-4 mixed-length probe
    # caught (p=1232, L=1024, b=2) 65 KB over at pt_c=8.  Subtract the pin
    # and relax the large-p floor for L >= 512 (those shapes are L-tiled
    # and were never covered by the round-2 pt_c=8 measurement).
    stats_pin = b * l * 3 * d * 4 if l >= 512 else 0
    pt_c = _env_pt_c or _pick_tile_bwd(
        p, lt, d, live_rows=18,
        floor=4 if (hi or p < 1024 or l >= 512) else 8,
        budget_bytes=max((2 if hi else 4) * 1024 * 1024 - stats_pin,
                         1024 * 1024))
    # Row backward: ~2.1 MB/row measured at L=256 (16.68 MB at pt=8), so an
    # 8 MiB target inside the 16 MiB scope picks pt=4 at L=256, 2 at L=512,
    # 1 at L=1024 (pt=2 there measured over the scope).  Beyond the resident
    # cap the L-tiled E1/E2 pair takes over — its site tile is kernel C's
    # lt, and its pair tile a power of two <= 8 so pt_pad stays divisible.
    resident_e = l <= _BWD_RESIDENT_SITES_MAX
    pt_e = _env_pt_e or _pick_tile_bwd(
        p, l if resident_e else lt, d, live_rows=28,
        floor=1,
        budget_bytes=max((4 if hi else 8) * 1024 * 1024 - stats_pin,
                         1024 * 1024))
    if not resident_e:
        pt_e = min(8, 1 << max(0, pt_e.bit_length() - 1))
    # One padding serves all kernels: multiple of every tile (powers of two).
    pt_pad = max(pt_c, pt_e, 8)
    p_pad = -(-p // pt_pad) * pt_pad
    if p_pad != p:
        padw = ((0, 0), (0, p_pad - p), (0, 0), (0, 0))
        x = jnp.pad(x, padw)
        x1 = jnp.pad(x1, padw)
        g3 = jnp.pad(g3, padw)
        pair_mask = jnp.pad(pair_mask, ((0, 0), (0, p_pad - p)))

    site_mask3 = site_mask[:, :, None].astype(jnp.float32)  # (B, L, 1)
    pair_mask4 = pair_mask[:, :, None, None].astype(jnp.float32)  # (B,P,1,1)
    count_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    f32 = jnp.float32

    # ---- kernel C/D grid: (B, L-tiles, P-tiles), pair axis innermost so the
    # per-(batch, L-tile) A1 block stays resident while pairs accumulate.
    grid_c = (b, n_ltiles, p_pad // pt_c)
    tile_c = pl.BlockSpec(
        (1, pt_c, lt, d), lambda bi, li, pi: (bi, pi, li, 0),
        memory_space=pltpu.VMEM,
    )
    pmask_c = pl.BlockSpec(
        (1, pt_c, 1, 1), lambda bi, li, pi: (bi, pi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    stats_c = pl.BlockSpec(
        (1, lt, 3 * d), lambda bi, li, pi: (bi, li, 0), memory_space=pltpu.VMEM
    )
    a1_c = pl.BlockSpec(
        (1, lt, d), lambda bi, li, pi: (bi, li, 0), memory_space=pltpu.VMEM
    )

    def wgrad_spec_c(shape):
        return pl.BlockSpec(shape, lambda bi, li, pi: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # ---- kernel E grid: (B, P-tiles), full site axis resident (row attn).
    grid_e = (b, p_pad // pt_e)
    tile_e = pl.BlockSpec(
        (1, pt_e, l, d), lambda bi, pi: (bi, pi, 0, 0), memory_space=pltpu.VMEM
    )
    smask_e = pl.BlockSpec(
        (1, l, 1), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM
    )

    def wgrad_spec(shape):
        return pl.BlockSpec(shape, lambda bi, pi: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # ---- kernel C: FFN backward + column d_attn/A1 ----
    c_params = [
        layer["col_norm"]["scale"], layer["col_norm"]["bias"],
        ca["wq"], ca["bq"], ca["wo"].T, ca["bo"],
        layer["ffn_norm"]["scale"], layer["ffn_norm"]["bias"],
        ffn["w1"], ffn["b1"], ffn["w1"].T, ffn["w2"].T,
    ]
    c_out_shapes = (
        jax.ShapeDtypeStruct((b, p_pad, l, d), x.dtype),  # g2
        jax.ShapeDtypeStruct((b, l, d), f32),  # A1
        jax.ShapeDtypeStruct((d, d), f32),  # dWo_c
        jax.ShapeDtypeStruct((1, d), f32),  # dbo_c
        jax.ShapeDtypeStruct((1, d), f32),  # dγ_f
        jax.ShapeDtypeStruct((1, d), f32),  # dβ_f
        jax.ShapeDtypeStruct((d, f), f32),  # dW1
        jax.ShapeDtypeStruct((1, f), f32),  # db1
        jax.ShapeDtypeStruct((f, d), f32),  # dW2
        jax.ShapeDtypeStruct((1, d), f32),  # db2
    )
    c_out_specs = (
        tile_c, a1_c,
        wgrad_spec_c((d, d)), wgrad_spec_c((1, d)), wgrad_spec_c((1, d)),
        wgrad_spec_c((1, d)), wgrad_spec_c((d, f)), wgrad_spec_c((1, f)),
        wgrad_spec_c((f, d)), wgrad_spec_c((1, d)),
    )
    g2, a1, dcwo, dcbo, dfn_s, dfn_b, dfw1, dfb1, dfw2, dfb2 = pl.pallas_call(
        functools.partial(_kernel_c, n_heads=n_heads, eps=eps, prec=prec,
                          interpret=interpret),
        grid=grid_c,
        in_specs=[tile_c, tile_c, stats_c, pmask_c, count_spec]
        + [full() for _ in c_params],
        out_specs=c_out_specs,
        out_shape=c_out_shapes,
        interpret=interpret,
    )(x1, g3, stats, pair_mask4, pair_count, *c_params)

    if psum_axis is not None:
        # multi-chip: A1 = Σ over ALL pairs of d_attn ⊙ qn — the sole
        # cross-shard coupling of the whole block backward
        a1 = jax.lax.psum(a1, psum_axis)

    # ---- kernel D: column-attention finalize (L-tiled like kernel C) ----
    d_params = [
        layer["col_norm"]["scale"], layer["col_norm"]["bias"],
        ca["wq"], ca["bq"], ca["wq"].T, ca["wk"], ca["bk"], ca["wk"].T,
        ca["wv"], ca["bv"], ca["wv"].T, ca["wo"].T,
    ]
    d_out_shapes = (
        jax.ShapeDtypeStruct((b, p_pad, l, d), x.dtype),  # g1
        jax.ShapeDtypeStruct((1, d), f32),  # dγ_c
        jax.ShapeDtypeStruct((1, d), f32),  # dβ_c
        jax.ShapeDtypeStruct((d, h), f32),  # dWq_c
        jax.ShapeDtypeStruct((1, h), f32),  # dbq_c
        jax.ShapeDtypeStruct((d, h), f32),  # dWk_c
        jax.ShapeDtypeStruct((1, h), f32),  # dbk_c
        jax.ShapeDtypeStruct((d, d), f32),  # dWv_c
        jax.ShapeDtypeStruct((1, d), f32),  # dbv_c
    )
    d_out_specs = (tile_c,) + tuple(
        wgrad_spec_c(s.shape) for s in d_out_shapes[1:]
    )
    g1, dcn_s, dcn_b, dcwq, dcbq, dcwk, dcbk, dcwv, dcbv = pl.pallas_call(
        functools.partial(_kernel_d, n_heads=n_heads, eps=eps, prec=prec,
                          interpret=interpret),
        grid=grid_c,
        in_specs=[tile_c, tile_c, stats_c, a1_c, pmask_c, count_spec]
        + [full() for _ in d_params],
        out_specs=d_out_specs,
        out_shape=d_out_shapes,
        interpret=interpret,
    )(x1, g2, stats, a1, pair_mask4, pair_count, *d_params)

    # ---- kernel E: row backward (full site axis resident) ----
    e_params = [
        layer["row_norm"]["scale"], layer["row_norm"]["bias"],
        la["wq"], la["bq"], la["wq"].T, la["wk"], la["bk"], la["wk"].T,
        la["wv"], la["bv"], la["wv"].T, la["wo"].T,
    ]
    e_out_shapes = (
        jax.ShapeDtypeStruct((b, p_pad, l, d), x.dtype),  # gx
        jax.ShapeDtypeStruct((1, d), f32),  # dγ_r
        jax.ShapeDtypeStruct((1, d), f32),  # dβ_r
        jax.ShapeDtypeStruct((d, h), f32),  # dWq_r
        jax.ShapeDtypeStruct((1, h), f32),  # dbq_r
        jax.ShapeDtypeStruct((d, h), f32),  # dWk_r
        jax.ShapeDtypeStruct((1, h), f32),  # dbk_r
        jax.ShapeDtypeStruct((d, d), f32),  # dWv_r
        jax.ShapeDtypeStruct((1, d), f32),  # dbv_r
        jax.ShapeDtypeStruct((d, d), f32),  # dWo_r
        jax.ShapeDtypeStruct((1, d), f32),  # dbo_r
    )
    if resident_e:
        e_out_specs = (tile_e,) + tuple(
            wgrad_spec(s.shape) for s in e_out_shapes[1:]
        )
        outs = pl.pallas_call(
            functools.partial(_kernel_e, n_heads=n_heads, eps=eps, prec=prec,
                              interpret=interpret),
            grid=grid_e,
            in_specs=[tile_e, tile_e, smask_e] + [full() for _ in e_params],
            out_specs=e_out_specs,
            out_shape=e_out_shapes,
            interpret=interpret,
        )(x, g1, site_mask3, *e_params)
    else:
        # L-tiled row backward: E1 accumulates the per-pair sums across site
        # tiles (sites innermost); E2 finalizes per tile.  Grids share the
        # kernel-C site tile so no additional padding of l is needed.
        grid_et = (b, p_pad // pt_e, n_ltiles)
        tile_et = pl.BlockSpec(
            (1, pt_e, lt, d), lambda bi, pi, li: (bi, pi, li, 0),
            memory_space=pltpu.VMEM,
        )
        smask_et = pl.BlockSpec(
            (1, lt, 1), lambda bi, pi, li: (bi, li, 0),
            memory_space=pltpu.VMEM,
        )
        rowsums_spec = pl.BlockSpec(
            (1, pt_e, 1, 4 * d), lambda bi, pi, li: (bi, pi, 0, 0),
            memory_space=pltpu.VMEM,
        )
        e1_params = [
            layer["row_norm"]["scale"], layer["row_norm"]["bias"],
            la["wq"], la["bq"], la["wk"], la["bk"], la["wv"], la["bv"],
            la["wo"].T,
        ]
        rowsums = pl.pallas_call(
            functools.partial(_kernel_e1, n_heads=n_heads, eps=eps, prec=prec,
                              interpret=interpret),
            grid=grid_et,
            in_specs=[tile_et, tile_et, smask_et]
            + [full() for _ in e1_params],
            out_specs=rowsums_spec,
            out_shape=jax.ShapeDtypeStruct((b, p_pad, 1, 4 * d), f32),
            interpret=interpret,
        )(x, g1, site_mask3, *e1_params)

        site_count = jnp.sum(site_mask.astype(jnp.float32), axis=1)[:, None]
        e_out_specs = (tile_et,) + tuple(
            pl.BlockSpec(s.shape, (lambda nd: lambda bi, pi, li: (0,) * nd)(
                len(s.shape)), memory_space=pltpu.VMEM)
            for s in e_out_shapes[1:]
        )
        outs = pl.pallas_call(
            functools.partial(_kernel_e2, n_heads=n_heads, eps=eps, prec=prec,
                              interpret=interpret),
            grid=grid_et,
            in_specs=[tile_et, tile_et, rowsums_spec, smask_et, count_spec]
            + [full() for _ in e_params],
            out_specs=e_out_specs,
            out_shape=e_out_shapes,
            interpret=interpret,
        )(x, g1, rowsums, site_mask3, site_count, *e_params)
    (gx, drn_s, drn_b, drwq, drbq, drwk, drbk, drwv, drbv, drwo, drbo) = outs

    if p_pad != p or l != l_orig:
        gx = gx[:, :p, :l_orig]

    dlayer = {
        "row_norm": {"scale": drn_s[0], "bias": drn_b[0]},
        "row_attn": {
            "wq": drwq, "bq": drbq[0], "wk": drwk, "bk": drbk[0],
            "wv": drwv, "bv": drbv[0], "wo": drwo, "bo": drbo[0],
        },
        "col_norm": {"scale": dcn_s[0], "bias": dcn_b[0]},
        "col_attn": {
            "wq": dcwq, "bq": dcbq[0], "wk": dcwk, "bk": dcbk[0],
            "wv": dcwv, "bv": dcbv[0], "wo": dcwo, "bo": dcbo[0],
        },
        "ffn_norm": {"scale": dfn_s[0], "bias": dfn_b[0]},
        "ffn": {"w1": dfw1, "b1": dfb1[0], "w2": dfw2, "b2": dfb2[0]},
    }
    return gx, dlayer
