"""Fused Pallas TPU kernels for the Phyloformer axial block.

The XLA path (``models/phyloformer.py``) is numerically canonical but
memory-bound: each block makes ~15 HBM passes over the ``(B, P, L, d)``
activations (LN reads, q/k/v projections, transposes for the pair-axis
attention, FFN).  These kernels restructure one block into two passes:

- **Kernel A** (grid ``B x P-tiles``): row sub-block fully fused — LN,
  q/k/v projections, masked scaled-linear attention over the tile-resident
  site axis, output projection, residual — then, on the result, the column
  LN + k/q/v projections whose pair-axis sums (Σk, Σq, Σk·v) are accumulated
  across grid steps into a tiny ``(L, 2H + d)`` stats buffer.  Linear
  attention's pair-axis state is exactly these sums, so no transpose and no
  second pass over pairs is needed.
- **Kernel B** (grid ``B x P-tiles``): recomputes the cheap column LN+q
  projection, forms the attention output from the global stats
  (``ctx = Σk·v / Σk``, ``q̂ = q/(Σq/Π)``), applies the output projection,
  residual, then the fused FFN sub-block — one read, one write.

Numerics match :func:`phyloformer_tpu.ops.attention.scaled_linear_attention`
with masks (padded sites/pairs are exact no-ops).  fp32 throughout; the
matmuls are tiny (d=64) so the win is bandwidth, not MXU.

Deterministic kernels (no dropout — the published-checkpoint setting).
Training uses these forwards through the analytic custom VJP in
:mod:`.autodiff` backed by the fused backward kernels in
:mod:`.axial_block_bwd`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _erf(x):
    # Abramowitz & Stegun 7.1.26 rational approximation (|err| <= 1.5e-7)
    # using only exp — Mosaic's TPU lowering supports neither erf nor erfc.
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # 0.5 x (1 + erf(x/sqrt(2))) with the rational erf above.
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x):
    # torch.nn.GELU(approximate='tanh') form (|err| vs exact <= ~1e-3 abs):
    # 0.5 x (1 + tanh(sqrt(2/pi) (x + 0.044715 x^3))).  tanh lowers natively
    # in Mosaic; ~6 VPU ops vs the rational-erf path's ~13 (reciprocal +
    # 5-term poly + exp + sign/abs/select) — the measured-cheaper variant
    # for the VPU-bound inference pipeline (see docs/performance.md round 5).
    inner = 0.7978845608028654 * (x + 0.044715 * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _gelu_sigmoid(x):
    # x * sigmoid(1.702 x) (Hendrycks & Gimpel) — cheapest (~4 VPU ops),
    # |err| vs exact up to ~2e-2 abs; probe-only unless the end-metric
    # accuracy gate stays green.
    return x * jax.nn.sigmoid(1.702 * x)


_GELU_FNS = {
    "exact": _gelu_exact,
    "tanh": _gelu_tanh,
    "sigmoid": _gelu_sigmoid,
    # upper-bound probe: how fast would the kernel be with a free activation
    "relu": lambda x: jnp.maximum(x, 0.0),
}


def _gelu(x, mode: str = "exact"):
    return _GELU_FNS[mode](x)


def _phi(x):
    # elu(x) + 1 without expm1 (unsupported in Pallas TPU lowering):
    # x > 0: x + 1;  x <= 0: (exp(x) - 1) + 1 = exp(x).
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _expand_heads(t, hd: int, interpret: bool,
                  prec=jax.lax.Precision.HIGHEST):
    """(..., H) -> (..., H*hd) by repeating each head value over its value
    block (head-major), so all subsequent elementwise work runs on lane-full
    d-wide tensors instead of 32x-padded H-wide ones.

    Implemented as a matmul with a constant 0/1 block-expansion matrix —
    cheap on the MXU and layout-friendly (pltpu.repeat provokes VMEM-hungry
    layout casts in this toolchain).

    ``prec`` should follow the kernel's matmul precision: the 0/1 matrix
    side is exact in any precision, but DEFAULT (single-pass bf16 MXU)
    rounds the *values* to bf16 — in fp32-parity mode that rounding was the
    dominant term of the fused path's drift (on-chip fused-vs-XLA gradient
    error 3.6e-2 -> 5.3e-5 after pinning HIGHEST there)."""
    if interpret:
        return jnp.repeat(t, hd, axis=-1)
    h = t.shape[-1]
    d = h * hd
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (h, d), 1) // hd
    head_row = jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
    expand = (head_of_lane == head_row).astype(t.dtype)  # (H, d)
    flat = jnp.dot(t.reshape(-1, h), expand, precision=prec,
                   preferred_element_type=jnp.float32)
    return flat.reshape(t.shape[:-1] + (d,))


def _mm_b(a, w, b, prec):
    """Tile matmul + bias with fp32 accumulation (any input rank)."""
    return jnp.dot(a.reshape(-1, a.shape[-1]), w, precision=prec,
                   preferred_element_type=jnp.float32).reshape(
                       a.shape[:-1] + (w.shape[-1],)) + b


def _proj_phi(h, w, b, hd, interpret, prec):
    """φ(h @ w + b) in head-expanded d-wide layout.

    Two weight layouts are accepted (distinguished by static shape):
    - (d, H): project to per-head scalars, apply φ, then head-expand via
      the 0/1 matmul (the original 3-pass form);
    - (d, d) pre-expanded (each head column repeated over its value
      block): ONE matmul then φ — φ commutes with repetition, so this is
      the same function with one fewer MXU pass and one fewer rounding
      (the expansion matmul's bf16 rounding disappears in DEFAULT mode).
    """
    if w.shape[-1] == h.shape[-1]:  # pre-expanded weights
        return _phi(_mm_b(h, w, b, prec))
    return _expand_heads(_phi(_mm_b(h, w, b, prec)), hd, interpret, prec)


def expand_qk_weights(layer):
    """Pre-expand a layer's q/k projection weights to the d-wide layout
    consumed by :func:`_proj_phi`'s fast path (pure repetition — exact)."""
    import jax.numpy as _jnp

    def ex(attn):
        d = attn["wq"].shape[0]
        hd = d // attn["wq"].shape[1]
        out = dict(attn)
        for k in ("wq", "wk"):
            out[k] = _jnp.repeat(attn[k], hd, axis=1)
        for k in ("bq", "bk"):
            out[k] = _jnp.repeat(attn[k], hd)
        return out

    new = dict(layer)
    new["row_attn"] = ex(layer["row_attn"])
    new["col_attn"] = ex(layer["col_attn"])
    return new


def _body_row_attn(x, smask, rp, hd, eps, prec, interpret):
    """Row sub-block on a resident site axis: ``x1 = x + rowattn(LN x)``.

    Heads are expanded to d-wide tensors immediately (head-major value
    blocks): per-head q/k are scalars, so broadcasting them across each
    head's value block turns every attention step into a lane-full
    elementwise op — no (.., H=4) lane-padded traffic, no per-head loops.

    ``rp = (rn_s, rn_b, wq, bq, wk, bk, wv, bv, wo, bo)`` (values, not refs).
    """
    rn_s, rn_b, rwq, rbq, rwk, rbk, rwv, rbv, rwo, rbo = rp
    h = _ln(x, rn_s, rn_b, eps)
    q = _proj_phi(h, rwq, rbq, hd, interpret, prec)
    k = _proj_phi(h, rwk, rbk, hd, interpret, prec)
    q = q * smask[None, :, :]  # (Pt, L, d)
    k = k * smask[None, :, :]
    v = _mm_b(h, rwv, rbv, prec)  # (Pt, L, d)

    count = jnp.maximum(jnp.sum(smask), 1.0)
    q_mean = jnp.sum(q, axis=1, keepdims=True) / count  # (Pt, 1, d)
    k_sum = jnp.sum(k, axis=1, keepdims=True)  # (Pt, 1, d)
    # zero-sum guard (fully-masked axes): avoids NaN propagation
    q_mean = jnp.where(q_mean > 0, q_mean, 1.0)
    k_sum = jnp.where(k_sum > 0, k_sum, 1.0)
    qn = q / q_mean
    kn = k / k_sum

    ctx = jnp.sum(kn * v, axis=1)  # (Pt, d) — per-head blocks of k-weighted v
    attn = qn * ctx[:, None, :]  # (Pt, L, d)
    return x + _mm_b(attn, rwo, rbo, prec)


def _body_col_stats(x1, pmask, cp, hd, eps, prec, interpret):
    """Column-attention partial sums over one pair tile: ``(L, 3d)`` =
    ``[Σk | Σq | Σk·v]`` in head-expanded layout.  Linear attention's
    pair-axis state is exactly these sums, so accumulating them across
    pair tiles replaces the transpose + second pass over pairs.

    ``cp = (cn_s, cn_b, wq, bq, wk, bk, wv, bv)``."""
    cn_s, cn_b, cwq, cbq, cwk, cbk, cwv, cbv = cp
    hc = _ln(x1, cn_s, cn_b, eps)
    qc = _proj_phi(hc, cwq, cbq, hd, interpret, prec)
    kc = _proj_phi(hc, cwk, cbk, hd, interpret, prec)
    qc = qc * pmask  # (Pt, L, d) x (Pt, 1, 1)
    kc = kc * pmask
    vc = _mm_b(hc, cwv, cbv, prec)  # (Pt, L, d)
    return jnp.concatenate(
        [jnp.sum(kc, axis=0), jnp.sum(qc, axis=0), jnp.sum(kc * vc, axis=0)],
        axis=-1,
    )  # (L, 3d)


def _body_b(x1, stats, n_pairs, bp, hd, eps, prec, interpret,
            gelu: str = "exact"):
    """Column attention finalized from the global stats + fused FFN: x3.

    ``bp = (cn_s, cn_b, cwq, cbq, cwo, cbo, fn_s, fn_b, fw1, fb1, fw2,
    fb2)``."""
    cn_s, cn_b, cwq, cbq, cwo, cbo, fn_s, fn_b, fw1, fb1, fw2, fb2 = bp
    d = x1.shape[-1]
    hc = _ln(x1, cn_s, cn_b, eps)
    qc = _proj_phi(hc, cwq, cbq, hd, interpret, prec)

    k_sum = stats[:, :d]  # (L, d)
    q_sum = stats[:, d : 2 * d]
    kv = stats[:, 2 * d :]

    q_mean = q_sum / n_pairs  # (L, d)
    q_mean = jnp.where(q_mean > 0, q_mean, 1.0)
    k_sum = jnp.where(k_sum > 0, k_sum, 1.0)
    ctx = kv / k_sum  # (L, d)

    attn = (qc / q_mean[None, :, :]) * ctx[None, :, :]  # (Pt, L, d)
    x2 = x1 + _mm_b(attn, cwo, cbo, prec)

    h = _ln(x2, fn_s, fn_b, eps)
    f = _gelu(_mm_b(h, fw1, fb1, prec), gelu)
    return x2 + _mm_b(f, fw2, fb2, prec)


def _kernel_a(
    # inputs
    x_ref, site_mask_ref, pair_mask_ref,
    rn_s_ref, rn_b_ref, rwq_ref, rbq_ref, rwk_ref, rbk_ref,
    rwv_ref, rbv_ref, rwo_ref, rbo_ref,
    cn_s_ref, cn_b_ref, cwq_ref, cbq_ref, cwk_ref, cbk_ref,
    cwv_ref, cbv_ref,
    # outputs
    x1_ref, stats_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    pt = pl.program_id(1)
    x = x_ref[0]  # (Pt, L, d)
    hd = x.shape[-1] // n_heads
    smask = site_mask_ref[0].astype(x.dtype)  # (L, 1) — keep 2-D (Mosaic
    # cannot reduce offset-sliced 1-D vectors)
    pmask = pair_mask_ref[0].astype(x.dtype)  # (Pt, 1, 1)

    x1 = _body_row_attn(
        x, smask,
        (rn_s_ref[:], rn_b_ref[:], rwq_ref[:], rbq_ref[:], rwk_ref[:],
         rbk_ref[:], rwv_ref[:], rbv_ref[:], rwo_ref[:], rbo_ref[:]),
        hd, eps, prec, interpret,
    )
    x1_ref[0] = x1

    part = _body_col_stats(
        x1, pmask,
        (cn_s_ref[:], cn_b_ref[:], cwq_ref[:], cbq_ref[:], cwk_ref[:],
         cbk_ref[:], cwv_ref[:], cbv_ref[:]),
        hd, eps, prec, interpret,
    )

    @pl.when(pt == 0)
    def _init():
        stats_ref[0] = part

    @pl.when(pt > 0)
    def _acc():
        stats_ref[0] += part


def _kernel_b(
    x1_ref, stats_ref, pair_mask_ref, pair_count_ref,
    cn_s_ref, cn_b_ref, cwq_ref, cbq_ref, cwo_ref, cbo_ref,
    fn_s_ref, fn_b_ref, fw1_ref, fb1_ref, fw2_ref, fb2_ref,
    x3_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    x1 = x1_ref[0]  # (Pt, L, d)
    hd = x1.shape[-1] // n_heads
    stats = stats_ref[0]  # (L, 3d) — Σk, Σq, Σk·v in head-expanded layout
    n_pairs = jnp.maximum(pair_count_ref[pl.program_id(0), 0], 1.0)
    x3_ref[0] = _body_b(
        x1, stats, n_pairs,
        (cn_s_ref[:], cn_b_ref[:], cwq_ref[:], cbq_ref[:], cwo_ref[:],
         cbo_ref[:], fn_s_ref[:], fn_b_ref[:], fw1_ref[:], fb1_ref[:],
         fw2_ref[:], fb2_ref[:]),
        hd, eps, prec, interpret,
    )


def _kernel_a1(
    # L-tiled pass 1: accumulate the row-attention sums over site tiles.
    x_ref, site_mask_ref,
    rn_s_ref, rn_b_ref, rwq_ref, rbq_ref, rwk_ref, rbk_ref,
    rwv_ref, rbv_ref,
    rowstats_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    def mm(a, w, b):
        return jnp.dot(a.reshape(-1, a.shape[-1]), w, precision=prec,
                       preferred_element_type=jnp.float32).reshape(
                           a.shape[:-1] + (w.shape[-1],)) + b
    li = pl.program_id(2)
    x = x_ref[0]  # (Pt, Lt, d)
    d = x.shape[-1]
    hd = d // n_heads
    smask = site_mask_ref[0].astype(x.dtype)  # (Lt, 1)

    h = _ln(x, rn_s_ref[:], rn_b_ref[:], eps)
    q = _expand_heads(_phi(mm(h, rwq_ref[:], rbq_ref[:])), hd, interpret, prec)
    k = _expand_heads(_phi(mm(h, rwk_ref[:], rbk_ref[:])), hd, interpret, prec)
    q = q * smask[None, :, :]
    k = k * smask[None, :, :]
    v = mm(h, rwv_ref[:], rbv_ref[:])

    part = jnp.concatenate(
        [jnp.sum(q, axis=1), jnp.sum(k, axis=1), jnp.sum(k * v, axis=1)],
        axis=-1,
    )  # (Pt, 3d): Σ_L q, Σ_L k, Σ_L k·v for this site tile

    @pl.when(li == 0)
    def _init():
        rowstats_ref[0] = part

    @pl.when(li > 0)
    def _acc():
        rowstats_ref[0] += part


def _kernel_a2(
    # L-tiled pass 2: finalize row attention from the global row sums, emit
    # x1, and accumulate the column stats over pair tiles.
    x_ref, rowstats_ref, site_mask_ref, pair_mask_ref, site_count_ref,
    rn_s_ref, rn_b_ref, rwq_ref, rbq_ref, rwo_ref, rbo_ref,
    cn_s_ref, cn_b_ref, cwq_ref, cbq_ref, cwk_ref, cbk_ref,
    cwv_ref, cbv_ref,
    x1_ref, stats_ref,
    *, n_heads: int, eps: float, prec, interpret: bool,
):
    def mm(a, w, b):
        return jnp.dot(a.reshape(-1, a.shape[-1]), w, precision=prec,
                       preferred_element_type=jnp.float32).reshape(
                           a.shape[:-1] + (w.shape[-1],)) + b
    pi = pl.program_id(2)
    x = x_ref[0]  # (Pt, Lt, d)
    d = x.shape[-1]
    hd = d // n_heads
    smask = site_mask_ref[0].astype(x.dtype)  # (Lt, 1)
    pmask = pair_mask_ref[0].astype(x.dtype)  # (Pt, 1, 1)
    rowstats = rowstats_ref[0]  # (Pt, 3d)

    h = _ln(x, rn_s_ref[:], rn_b_ref[:], eps)
    q = _expand_heads(_phi(mm(h, rwq_ref[:], rbq_ref[:])), hd, interpret, prec)
    q = q * smask[None, :, :]

    count = jnp.maximum(site_count_ref[pl.program_id(0), 0], 1.0)
    # slice 2-D first, broadcast after — Mosaic cannot lower a combined
    # None+slice index (it becomes a gather)
    q_mean = rowstats[:, :d] / count  # (Pt, d)
    k_sum = rowstats[:, d : 2 * d]
    kv = rowstats[:, 2 * d :]
    q_mean = jnp.where(q_mean > 0, q_mean, 1.0)
    k_sum = jnp.where(k_sum > 0, k_sum, 1.0)
    ctx = kv / k_sum  # (Pt, d)

    attn = (q / q_mean[:, None, :]) * ctx[:, None, :]  # (Pt, Lt, d)
    x1 = x + mm(attn, rwo_ref[:], rbo_ref[:])
    x1_ref[0] = x1

    hc = _ln(x1, cn_s_ref[:], cn_b_ref[:], eps)
    qc = _expand_heads(_phi(mm(hc, cwq_ref[:], cbq_ref[:])), hd, interpret, prec)
    kc = _expand_heads(_phi(mm(hc, cwk_ref[:], cbk_ref[:])), hd, interpret, prec)
    qc = qc * pmask
    kc = kc * pmask
    vc = mm(hc, cwv_ref[:], cbv_ref[:])

    part = jnp.concatenate(
        [jnp.sum(kc, axis=0), jnp.sum(qc, axis=0), jnp.sum(kc * vc, axis=0)],
        axis=-1,
    )  # (Lt, 3d)

    @pl.when(pi == 0)
    def _init():
        stats_ref[0] = part

    @pl.when(pi > 0)
    def _acc():
        stats_ref[0] += part


def _pick_tile(p: int, l: int, d: int, budget_bytes: int = 8 * 1024 * 1024,
               highest: bool = False) -> int:
    """Pair-tile size: keep the live tile tensors under a VMEM budget.

    With head-expanded d-wide tensors throughout, ~7 live (row, L, d)
    buffers (incl. double-buffered in/out blocks) bound the footprint.

    The pair tile is a *leading* block dim — TPU tiling constraints bind
    only the trailing (L, d) dims, and the pair mask is carried 4-D
    ``(B, P, 1, 1)`` so no mask block puts Pt in a constrained position —
    so the tile may shrink all the way to 1 row.  That is what lifts the
    old L<=640 cap: at L=2048 a 2-row tile keeps the whole site axis
    resident within the 16 MiB VMEM scope, and the compute shapes stay
    MXU-friendly (rows = Pt*L stays in the thousands)."""
    per_row = l * d * 4 * 7
    pt = budget_bytes // max(per_row, 1)
    # footprint ceiling: pt*l <= 4096 row-units is the largest configuration
    # verified to compile within the 16 MiB scope (pt=16 at L=256 measured
    # +2.6% throughput over pt=8; pt=4 at L=1024 and pt=2 at L=2048 sit at
    # or below the same footprint).  HIGHEST-precision matmuls need more
    # scratch per row at short L — measured on chip (round 3): pt=16/L=256
    # overflows by 3.7-7.7M in training/eval fusion contexts while
    # pt=8/L=256 compiles (round-1 fp32 kernels ran it), and at L=1024
    # pt=4 compiles (round-2 fused_highest oracle) while pt=2 does NOT —
    # so the HIGHEST ceiling halves only at short L rather than scaling
    # linearly.
    row_units = (2048 if l <= 512 else 4096) if highest else 4096
    pt = min(pt, max(1, row_units // max(l, 1)))
    pt = max(1, min(pt, p, 256))
    if pt >= 8:
        return (pt // 8) * 8
    return 4 if pt >= 4 else (2 if pt >= 2 else 1)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "eps", "interpret", "mxu_precision")
)
def fused_axial_block(
    x: jax.Array,
    layer: Dict[str, Any],
    site_mask: jax.Array,
    pair_mask: jax.Array,
    n_heads: int = 4,
    eps: float = 1e-5,
    interpret: bool = False,
    mxu_precision: str = "highest",
) -> jax.Array:
    """One Phyloformer block via the fused kernels.

    Args:
      x: ``(B, P, L, d)`` fp32 activations (``P`` padded to the tile multiple
        by the caller or here).
      layer: one element of ``params['layers']``.
      site_mask: ``(B, L)`` bool.
      pair_mask: ``(B, P)`` bool.
    """
    return _fused_block_impl(
        x, layer, site_mask, pair_mask, n_heads, eps, interpret, mxu_precision
    )[0]


# XLA decides per fusion context whether small custom-call outputs spill
# into the 16 MiB scope, so tile fits must be validated in the worst
# context; the HIGHEST ceilings in _pick_tile encode the round-3 on-chip
# measurements across engine, eval_fn, and jvp-of-residual contexts.


@functools.partial(
    jax.jit, static_argnames=("n_heads", "eps", "interpret", "mxu_precision")
)
def fused_axial_block_res(
    x: jax.Array,
    layer: Dict[str, Any],
    site_mask: jax.Array,
    pair_mask: jax.Array,
    n_heads: int = 4,
    eps: float = 1e-5,
    interpret: bool = False,
    mxu_precision: str = "highest",
):
    """Like :func:`fused_axial_block` but also returns the training
    residuals ``(x3, x1, stats)`` — the post-row-attention activations and
    the raw column sums — which the fused backward
    (:mod:`.axial_block_bwd`) consumes without any forward recompute."""
    return _fused_block_impl(
        x, layer, site_mask, pair_mask, n_heads, eps, interpret, mxu_precision
    )


def _fused_block_impl(
    x, layer, site_mask, pair_mask, n_heads, eps, interpret, mxu_precision
):
    prec = (
        jax.lax.Precision.HIGHEST
        if mxu_precision.lower() in ("highest", "float32")
        else jax.lax.Precision.DEFAULT
    )
    b, p, l, d = x.shape
    resident_max = (
        _RESIDENT_SITES_MAX_HI
        if prec == jax.lax.Precision.HIGHEST
        else _RESIDENT_SITES_MAX
    )
    if l > resident_max:
        return _fused_block_ltiled_impl(
            x, layer, site_mask, pair_mask, n_heads, eps, interpret, prec
        )
    pt = _pick_tile(p, l, d, highest=prec == jax.lax.Precision.HIGHEST)
    # pad the pair axis to a tile multiple (mask guarantees no-op padding)
    p_pad = -(-p // pt) * pt
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, 0), (0, 0)))
        pair_mask = jnp.pad(pair_mask, ((0, 0), (0, p_pad - p)))
    n_tiles = p_pad // pt

    hd = d // n_heads
    la = layer["row_attn"]
    ca = layer["col_attn"]
    ffn = layer["ffn"]

    grid = (b, n_tiles)
    tile_spec = pl.BlockSpec(
        (1, pt, l, d), lambda bi, pi: (bi, pi, 0, 0), memory_space=pltpu.VMEM
    )
    # masks carry trailing singletons so block shapes satisfy TPU tiling:
    # the site mask's (l, 1) trailing dims are full; the pair mask is 4-D so
    # Pt stays a leading (unconstrained) dim and may drop below 8.
    site_mask3 = site_mask[:, :, None].astype(jnp.float32)  # (B, L, 1)
    pair_mask4 = pair_mask[:, :, None, None].astype(jnp.float32)  # (B,P,1,1)
    smask_spec = pl.BlockSpec(
        (1, l, 1), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    pmask_spec = pl.BlockSpec(
        (1, pt, 1, 1), lambda bi, pi: (bi, pi, 0, 0), memory_space=pltpu.VMEM
    )
    stats_spec = pl.BlockSpec(
        (1, l, 3 * d), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM
    )

    def w(name_dict, key):
        return name_dict[key]

    full = lambda arr: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    a_params = [
        layer["row_norm"]["scale"], layer["row_norm"]["bias"],
        la["wq"], la["bq"], la["wk"], la["bk"], la["wv"], la["bv"],
        la["wo"], la["bo"],
        layer["col_norm"]["scale"], layer["col_norm"]["bias"],
        ca["wq"], ca["bq"], ca["wk"], ca["bk"], ca["wv"], ca["bv"],
    ]
    x1, stats = pl.pallas_call(
        functools.partial(_kernel_a, n_heads=n_heads, eps=eps, prec=prec, interpret=interpret),
        grid=grid,
        in_specs=[tile_spec, smask_spec, pmask_spec] + [full(p_) for p_ in a_params],
        out_specs=(tile_spec, stats_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, p_pad, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, l, 3 * d), jnp.float32),
        ),
        interpret=interpret,
    )(x, site_mask3, pair_mask4, *a_params)

    pair_count = jnp.sum(pair_mask.astype(jnp.float32), axis=1)[:, None]  # (B, 1)
    # full-array SMEM (no per-step blocking dodges rank/tiling constraints);
    # the kernel indexes its batch row via program_id(0)
    count_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    b_params = [
        layer["col_norm"]["scale"], layer["col_norm"]["bias"],
        ca["wq"], ca["bq"], ca["wo"], ca["bo"],
        layer["ffn_norm"]["scale"], layer["ffn_norm"]["bias"],
        ffn["w1"], ffn["b1"], ffn["w2"], ffn["b2"],
    ]
    x3 = pl.pallas_call(
        functools.partial(_kernel_b, n_heads=n_heads, eps=eps, prec=prec, interpret=interpret),
        grid=grid,
        in_specs=[tile_spec, stats_spec, pmask_spec, count_spec]
        + [full(p_) for p_ in b_params],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((b, p_pad, l, d), x.dtype),
        interpret=interpret,
    )(x1, stats, pair_mask4, pair_count, *b_params)

    if p_pad != p:
        x3 = x3[:, :p]
        x1 = x1[:, :p]
    return x3, x1, stats


# Longest site axis the single-pass kernel A keeps fully VMEM-resident
# (verified compiling + winning at L=2048 on the dev chip in DEFAULT/tf32
# mode).  HIGHEST-precision (3-pass fp32) matmuls materialize extra
# temporaries — kernel A measured 18.5 MiB at L=1536 under HIGHEST — so
# parity mode hands over to the L-tiled kernels earlier.  Beyond these the
# two-pass L-tiled kernels below take over instead of falling back to XLA.
_RESIDENT_SITES_MAX = 2048
_RESIDENT_SITES_MAX_HI = 1024

# L-tile of the two-pass path; pt*lt stays within the verified 4096
# row-unit footprint ceiling (see _pick_tile).
_LTILE = 256


def _ltiled_tiles(p: int, l: int):
    """(pair, site) tile sizes for the L-tiled kernels (A1/A2, L-tiled B).

    2048 row-units (vs the resident path's 4096): the two-pass kernels
    carry one extra live tile (rowstats + recomputed projections), and
    16.07 MiB > the 16 MiB scope at 4096 units (measured compile failure).
    Shared with the sharded kernel-B host wrapper so single- and
    multi-chip tiling stay in sync."""
    lt = min(_LTILE, l)
    pt = max(1, min(p, 2048 // lt))
    if pt >= 8:
        pt = (pt // 8) * 8
    return pt, lt


def _ltiled_kernel_a(x, layer, site_mask, pair_mask, n_heads, eps,
                     interpret, prec):
    """L-tiled equivalent of kernel A: ``(x1, stats)`` plus padded shapes.

    Kernel A's single pass over a resident site axis becomes A1 (row sums
    Σq/Σk/Σk·v accumulated across site tiles; grid b × P-tiles × L-tiles,
    site innermost) and A2 (row attention finalized from the global sums —
    the running-sum trick the pair axis already uses — emitting x1 and
    accumulating the column stats across pair tiles; grid b × L-tiles ×
    P-tiles, pair innermost).  Also serves the sharded (shard_map) path:
    both outputs are per-pair-shard local, with the caller psumming
    ``stats`` over the mesh 'pair' axis exactly as for resident kernel A.
    """
    b, p, l, d = x.shape
    pt, lt = _ltiled_tiles(p, l)
    l_pad = -(-l // lt) * lt
    p_pad = -(-p // pt) * pt
    if p_pad != p or l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, l_pad - l), (0, 0)))
        pair_mask = jnp.pad(pair_mask, ((0, 0), (0, p_pad - p)))
        site_mask = jnp.pad(site_mask, ((0, 0), (0, l_pad - l)))
    n_pt = p_pad // pt
    n_lt = l_pad // lt

    la = layer["row_attn"]
    ca = layer["col_attn"]
    site_mask3 = site_mask[:, :, None].astype(jnp.float32)  # (B, L, 1)
    pair_mask4 = pair_mask[:, :, None, None].astype(jnp.float32)  # (B,P,1,1)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # ---- pass 1: row sums, site tiles innermost ----
    a1_params = [
        layer["row_norm"]["scale"], layer["row_norm"]["bias"],
        la["wq"], la["bq"], la["wk"], la["bk"], la["wv"], la["bv"],
    ]
    rowstats = pl.pallas_call(
        functools.partial(_kernel_a1, n_heads=n_heads, eps=eps, prec=prec,
                          interpret=interpret),
        grid=(b, n_pt, n_lt),
        in_specs=[
            pl.BlockSpec((1, pt, lt, d), lambda bi, pi, li: (bi, pi, li, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, 1), lambda bi, pi, li: (bi, li, 0),
                         memory_space=pltpu.VMEM),
        ] + [full] * len(a1_params),
        out_specs=pl.BlockSpec((1, pt, 3 * d), lambda bi, pi, li: (bi, pi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, 3 * d), jnp.float32),
        interpret=interpret,
    )(x, site_mask3, *a1_params)

    # ---- pass 2: finalize rows, emit x1, column sums (pairs innermost) ----
    site_count = jnp.sum(site_mask.astype(jnp.float32), axis=1)[:, None]
    a2_params = [
        layer["row_norm"]["scale"], layer["row_norm"]["bias"],
        la["wq"], la["bq"], la["wo"], la["bo"],
        layer["col_norm"]["scale"], layer["col_norm"]["bias"],
        ca["wq"], ca["bq"], ca["wk"], ca["bk"], ca["wv"], ca["bv"],
    ]
    x1, stats = pl.pallas_call(
        functools.partial(_kernel_a2, n_heads=n_heads, eps=eps, prec=prec,
                          interpret=interpret),
        grid=(b, n_lt, n_pt),
        in_specs=[
            pl.BlockSpec((1, pt, lt, d), lambda bi, li, pi: (bi, pi, li, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pt, 3 * d), lambda bi, li, pi: (bi, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, 1), lambda bi, li, pi: (bi, li, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pt, 1, 1), lambda bi, li, pi: (bi, pi, 0, 0),
                         memory_space=pltpu.VMEM),
            smem,
        ] + [full] * len(a2_params),
        out_specs=(
            pl.BlockSpec((1, pt, lt, d), lambda bi, li, pi: (bi, pi, li, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, 3 * d), lambda bi, li, pi: (bi, li, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, p_pad, l_pad, d), x.dtype),
            jax.ShapeDtypeStruct((b, l_pad, 3 * d), jnp.float32),
        ),
        interpret=interpret,
    )(x, rowstats, site_mask3, pair_mask4, site_count, *a2_params)
    return x1, stats, (p_pad, l_pad, pt, lt)


def _fused_block_ltiled_impl(x, layer, site_mask, pair_mask, n_heads, eps,
                             interpret, prec):
    """Two-pass L-tiled fused block for site axes beyond VMEM residency.

    Removes the site cap entirely: see :func:`_ltiled_kernel_a` for the
    A1/A2 split; kernel B is per-site local and just gains the L grid
    dimension.  Costs one extra read of x vs the resident path, so the
    resident kernels keep serving shorter site axes.
    """
    b, p, l, d = x.shape
    x1, stats, (p_pad, l_pad, pt, lt) = _ltiled_kernel_a(
        x, layer, site_mask, pair_mask, n_heads, eps, interpret, prec
    )
    if p_pad != p or l_pad != l:
        pair_mask = jnp.pad(pair_mask, ((0, 0), (0, p_pad - p)))
        site_mask = jnp.pad(site_mask, ((0, 0), (0, l_pad - l)))
    n_pt = p_pad // pt
    n_lt = l_pad // lt
    ca = layer["col_attn"]
    ffn = layer["ffn"]
    pair_mask4 = pair_mask[:, :, None, None].astype(jnp.float32)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # ---- kernel B, L-tiled (per-site local; unchanged math) ----
    pair_count = jnp.sum(pair_mask.astype(jnp.float32), axis=1)[:, None]
    b_params = [
        layer["col_norm"]["scale"], layer["col_norm"]["bias"],
        ca["wq"], ca["bq"], ca["wo"], ca["bo"],
        layer["ffn_norm"]["scale"], layer["ffn_norm"]["bias"],
        ffn["w1"], ffn["b1"], ffn["w2"], ffn["b2"],
    ]
    x3 = pl.pallas_call(
        functools.partial(_kernel_b, n_heads=n_heads, eps=eps, prec=prec,
                          interpret=interpret),
        grid=(b, n_pt, n_lt),
        in_specs=[
            pl.BlockSpec((1, pt, lt, d), lambda bi, pi, li: (bi, pi, li, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, 3 * d), lambda bi, pi, li: (bi, li, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pt, 1, 1), lambda bi, pi, li: (bi, pi, 0, 0),
                         memory_space=pltpu.VMEM),
            smem,
        ] + [full] * len(b_params),
        out_specs=pl.BlockSpec((1, pt, lt, d), lambda bi, pi, li: (bi, pi, li, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, l_pad, d), x.dtype),
        interpret=interpret,
    )(x1, stats, pair_mask4, pair_count, *b_params)

    if p_pad != p or l_pad != l:
        x3 = x3[:, :p, :l]
        x1 = x1[:, :p, :l]
        stats = stats[:, :l]
    return x3, x1, stats


def fused_kernel_a(
    x: jax.Array,
    layer,
    site_mask: jax.Array,
    pair_mask: jax.Array,
    n_heads: int = 4,
    eps: float = 1e-5,
    interpret: bool = False,
    mxu_precision: str = "highest",
):
    """Kernel A alone: ``(x1, stats_raw)`` for one pair shard.

    Used by the multi-chip fused forward (:mod:`.sharded`), which psums the
    raw stats over the mesh 'pair' axis before running kernel B.  Beyond
    VMEM residency the L-tiled A1/A2 pair serves the same contract (both
    outputs stay per-shard local), so the sharded path has no site cap
    either."""
    prec = (
        jax.lax.Precision.HIGHEST
        if mxu_precision.lower() in ("highest", "float32")
        else jax.lax.Precision.DEFAULT
    )
    b, p, l, d = x.shape
    resident_max = (
        _RESIDENT_SITES_MAX_HI
        if prec == jax.lax.Precision.HIGHEST
        else _RESIDENT_SITES_MAX
    )
    if l > resident_max:
        x1, stats, (p_pad, l_pad, _, _) = _ltiled_kernel_a(
            x, layer, site_mask, pair_mask, n_heads, eps, interpret, prec
        )
        if p_pad != p or l_pad != l:
            x1 = x1[:, :p, :l]
            stats = stats[:, :l]
        return x1, stats
    pt = _pick_tile(p, l, d, highest=prec == jax.lax.Precision.HIGHEST)
    p_pad = -(-p // pt) * pt
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, 0), (0, 0)))
        pair_mask = jnp.pad(pair_mask, ((0, 0), (0, p_pad - p)))
    n_tiles = p_pad // pt
    grid = (b, n_tiles)
    la = layer["row_attn"]
    ca = layer["col_attn"]
    tile_spec = pl.BlockSpec(
        (1, pt, l, d), lambda bi, pi: (bi, pi, 0, 0), memory_space=pltpu.VMEM
    )
    site_mask3 = site_mask[:, :, None].astype(jnp.float32)
    pair_mask4 = pair_mask[:, :, None, None].astype(jnp.float32)
    smask_spec = pl.BlockSpec(
        (1, l, 1), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    pmask_spec = pl.BlockSpec(
        (1, pt, 1, 1), lambda bi, pi: (bi, pi, 0, 0), memory_space=pltpu.VMEM
    )
    stats_spec = pl.BlockSpec(
        (1, l, 3 * d), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    a_params = [
        layer["row_norm"]["scale"], layer["row_norm"]["bias"],
        la["wq"], la["bq"], la["wk"], la["bk"], la["wv"], la["bv"],
        la["wo"], la["bo"],
        layer["col_norm"]["scale"], layer["col_norm"]["bias"],
        ca["wq"], ca["bq"], ca["wk"], ca["bk"], ca["wv"], ca["bv"],
    ]
    x1, stats = pl.pallas_call(
        functools.partial(_kernel_a, n_heads=n_heads, eps=eps, prec=prec,
                          interpret=interpret),
        grid=grid,
        in_specs=[tile_spec, smask_spec, pmask_spec] + [full() for _ in a_params],
        out_specs=(tile_spec, stats_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, p_pad, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, l, 3 * d), jnp.float32),
        ),
        interpret=interpret,
    )(x, site_mask3, pair_mask4, *a_params)
    if p_pad != p:
        x1 = x1[:, :p]
    return x1, stats
