"""Pipelined fused forward: one kernel per block *boundary*.

The two-kernel-per-block design (:mod:`.axial_block`) pays 4 HBM passes
over the ``(B, P, L, d)`` activations per block: kernel A reads x / writes
x1, kernel B reads x1 / writes x3.  The stats barrier (kernel B needs the
column sums over ALL pair tiles) sits between A and B *of the same block*
— but there is no barrier between B of block i and A of block i+1.  So the
minimal-traffic schedule merges across the block boundary instead:

- **Kernel P0**: pair-gather (``pair[k] = emb[i_k] + emb[j_k]``, the
  reference's seq2pair — `/root/reference/phyloformer/model.py:175` — read
  straight from the tiny per-sequence embedding table resident in VMEM) +
  block-0 kernel A.  The quadratic pair tensor is never materialized in
  HBM on this path.
- **Kernel M** (×(n_blocks-1)): kernel B of block i (column attention
  finalized from the global stats + FFN) immediately followed by kernel A
  of block i+1 (row attention + next column stats) on the in-register x3.
- **Kernel Z**: kernel B of the last block + the softplus head and masked
  site-mean (`model.py:185-187`), emitting the ``(B, P)`` distances
  directly — the big tensor is never written after the last block.

HBM traffic per block drops 4 passes → 2 (read x1, write x1'), and the
embed/pair-build/head XLA round trips disappear: ~2 + 2·n_blocks total
passes vs ~4 + 4·n_blocks, and 2 + n_blocks dispatches vs ~4 + 2·n_blocks.
Optionally the inter-kernel activations are stored bfloat16 (compute is
always fp32 in-register), halving the remaining traffic and the HBM
residency — which is what makes the reference's largest (200 tips, 1000
sites) shape single-chip feasible.

Numerics: identical op order to the resident-path kernels (shared bodies
``_body_row_attn`` / ``_body_col_stats`` / ``_body_b``); with fp32 storage
the pipeline output bit-matches ``forward_fused`` up to tile-summation
order.  The head matmul is pinned HIGHEST (K=64, free) so storage dtype is
the only new rounding source.

Resident-L only (site axis ≤ the kernel-A residency cap); longer site axes
keep the two-pass L-tiled path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...data.pairs import pair_indices
from .axial_block import (
    _RESIDENT_SITES_MAX,
    _RESIDENT_SITES_MAX_HI,
    _body_b,
    _body_col_stats,
    _body_row_attn,
    _mm_b,
    expand_qk_weights,
)

# VMEM budget for the per-batch-element embedding block (n, L, d) fp32 the
# gather kernel keeps resident.  4 MB leaves the usual tile budget intact;
# larger alignments fall back to the XLA gather (traffic cost: one extra
# write+read of the pair tensor).
_P0_EMB_BUDGET_BYTES = 4 * 1024 * 1024


def _softplus(x):
    # log(1+e^x) = max(x,0) + log1p(e^-|x|); log1p via log (Mosaic has no
    # log1p lowering); fp32 throughout so the 1.0+ rounding is ~1e-8.
    return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))


def _row_params(layer):
    la = layer["row_attn"]
    return (layer["row_norm"]["scale"], layer["row_norm"]["bias"],
            la["wq"], la["bq"], la["wk"], la["bk"], la["wv"], la["bv"],
            la["wo"], la["bo"])


def _col_params(layer):
    ca = layer["col_attn"]
    return (layer["col_norm"]["scale"], layer["col_norm"]["bias"],
            ca["wq"], ca["bq"], ca["wk"], ca["bk"], ca["wv"], ca["bv"])


def _b_params(layer):
    ca = layer["col_attn"]
    ffn = layer["ffn"]
    return (layer["col_norm"]["scale"], layer["col_norm"]["bias"],
            ca["wq"], ca["bq"], ca["wo"], ca["bo"],
            layer["ffn_norm"]["scale"], layer["ffn_norm"]["bias"],
            ffn["w1"], ffn["b1"], ffn["w2"], ffn["b2"])


_N_ROW, _N_COL, _N_B = 10, 8, 12  # param counts per group


def _kernel_p0(
    emb_ref, ii_ref, jj_ref, site_mask_ref, pair_mask_ref,
    *refs,
    pt: int, n_heads: int, eps: float, prec, interpret: bool,
):
    """Pair-gather + block-0 kernel A.

    ``emb_ref``: (1, n, L, d) — the whole (tiny) per-sequence embedding for
    this batch element, resident in VMEM.  ``ii/jj``: (1, P_pad) int32 pair
    indices in SMEM.  Emits x1 (storage dtype) and the fp32 column stats.
    """
    rp = [r[:] for r in refs[:_N_ROW]]
    cp = [r[:] for r in refs[_N_ROW:_N_ROW + _N_COL]]
    x1_ref, stats_ref = refs[_N_ROW + _N_COL:]
    pi = pl.program_id(1)
    base = pi * pt
    # Unrolled gather: pair[k] = emb[i_k] + emb[j_k].  The pair index is a
    # dynamic slice on a leading (tiling-unconstrained) dim of the resident
    # block — 2·pt one-row loads per tile.
    rows = []
    for r in range(pt):
        i = ii_ref[0, base + r]
        j = jj_ref[0, base + r]
        rows.append(emb_ref[0, pl.ds(i, 1)] + emb_ref[0, pl.ds(j, 1)])
    x = jnp.concatenate(rows, axis=0)  # (Pt, L, d) fp32
    hd = x.shape[-1] // n_heads
    smask = site_mask_ref[0].astype(jnp.float32)  # (L, 1)
    pmask = pair_mask_ref[0].astype(jnp.float32)  # (Pt, 1, 1)

    x1 = _body_row_attn(x, smask, rp, hd, eps, prec, interpret)
    x1_store = x1.astype(x1_ref.dtype)
    x1_ref[0] = x1_store
    # stats from the ROUND-TRIPPED x1 so they match what kernel M reads
    part = _body_col_stats(x1_store.astype(jnp.float32), pmask, cp, hd, eps,
                           prec, interpret)

    @pl.when(pi == 0)
    def _init():
        stats_ref[0] = part

    @pl.when(pi > 0)
    def _acc():
        stats_ref[0] += part


def _kernel_a_only(
    x_ref, site_mask_ref, pair_mask_ref,
    *refs,
    n_heads: int, eps: float, prec, interpret: bool,
):
    """Kernel A with storage-dtype output (the XLA-gather fallback head of
    the pipeline, when the embedding block exceeds the VMEM budget)."""
    rp = [r[:] for r in refs[:_N_ROW]]
    cp = [r[:] for r in refs[_N_ROW:_N_ROW + _N_COL]]
    x1_ref, stats_ref = refs[_N_ROW + _N_COL:]
    pi = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    hd = x.shape[-1] // n_heads
    smask = site_mask_ref[0].astype(jnp.float32)
    pmask = pair_mask_ref[0].astype(jnp.float32)

    x1 = _body_row_attn(x, smask, rp, hd, eps, prec, interpret)
    x1_store = x1.astype(x1_ref.dtype)
    x1_ref[0] = x1_store
    part = _body_col_stats(x1_store.astype(jnp.float32), pmask, cp, hd, eps,
                           prec, interpret)

    @pl.when(pi == 0)
    def _init():
        stats_ref[0] = part

    @pl.when(pi > 0)
    def _acc():
        stats_ref[0] += part


def _kernel_m(
    x1_ref, stats_ref, site_mask_ref, pair_mask_ref, pair_count_ref,
    *refs,
    n_heads: int, eps: float, prec, interpret: bool, gelu: str = "exact",
):
    """Merged block boundary: kernel B of block i + kernel A of block i+1.

    Reads x1(i) (storage dtype) + global stats(i); emits x1(i+1) and
    accumulates stats(i+1).  x3 never touches HBM.
    """
    bp = [r[:] for r in refs[:_N_B]]
    rp = [r[:] for r in refs[_N_B:_N_B + _N_ROW]]
    cp = [r[:] for r in refs[_N_B + _N_ROW:_N_B + _N_ROW + _N_COL]]
    x1n_ref, statsn_ref = refs[_N_B + _N_ROW + _N_COL:]
    pi = pl.program_id(1)
    x1 = x1_ref[0].astype(jnp.float32)  # (Pt, L, d)
    hd = x1.shape[-1] // n_heads
    stats = stats_ref[0]  # (L, 3d) fp32
    smask = site_mask_ref[0].astype(jnp.float32)
    pmask = pair_mask_ref[0].astype(jnp.float32)
    n_pairs = jnp.maximum(pair_count_ref[pl.program_id(0), 0], 1.0)

    x3 = _body_b(x1, stats, n_pairs, bp, hd, eps, prec, interpret, gelu)
    x1n = _body_row_attn(x3, smask, rp, hd, eps, prec, interpret)
    x1n_store = x1n.astype(x1n_ref.dtype)
    x1n_ref[0] = x1n_store
    part = _body_col_stats(x1n_store.astype(jnp.float32), pmask, cp, hd, eps,
                           prec, interpret)

    @pl.when(pi == 0)
    def _init():
        statsn_ref[0] = part

    @pl.when(pi > 0)
    def _acc():
        statsn_ref[0] += part


def _kernel_z(
    x1_ref, stats_ref, site_mask_ref, pair_count_ref,
    *refs,
    n_heads: int, eps: float, prec, interpret: bool, gelu: str = "exact",
):
    """Final block's kernel B + softplus head + masked site-mean.

    Emits the per-pair distances as a (1, Pt, 1, 1) block — the big tensor
    is never written back after the last block.  The head matmul (d→1) is
    pinned HIGHEST: it feeds the output directly and costs nothing.
    """
    bp = [r[:] for r in refs[:_N_B]]
    hw_ref, hb_ref, out_ref = refs[_N_B:]
    x1 = x1_ref[0].astype(jnp.float32)  # (Pt, L, d)
    hd = x1.shape[-1] // n_heads
    stats = stats_ref[0]
    smask = site_mask_ref[0].astype(jnp.float32)  # (L, 1)
    n_pairs = jnp.maximum(pair_count_ref[pl.program_id(0), 0], 1.0)

    x3 = _body_b(x1, stats, n_pairs, bp, hd, eps, prec, interpret, gelu)
    # head: (Pt·L, d) @ (d, 1) + b  — HIGHEST so storage dtype stays the
    # only sub-fp32 rounding on this path
    h = _mm_b(x3, hw_ref[:], hb_ref[:], jax.lax.Precision.HIGHEST)
    sp = _softplus(h)  # (Pt, L, 1)
    count = jnp.maximum(jnp.sum(smask), 1.0)
    mean = jnp.sum(sp * smask[None, :, :], axis=1, keepdims=True) / count
    out_ref[0] = mean  # (Pt, 1, 1) into the (1, Pt, 1, 1) block


_VMEM_SCOPE = 16 * 1024 * 1024
_VMEM_MARGIN = int(1.5 * 1024 * 1024)


def _pipeline_tiles(b: int, p: int, l: int, d: int, highest: bool,
                    emb_bytes: int, overrides=(0, 0, 0)):
    """Per-kernel pair tiles + one shared pair padding.

    The scoped-VMEM fit is per *kernel*, so each stage gets its own tile;
    the pair axis is padded once to the largest (all tiles are powers of
    two, so every tile divides the padding).  Two measured costs beyond
    the tile temporaries (round-4 on-chip compile probes):

    - XLA pins the whole (B, L, 3d) stats buffers in VMEM space (S(1)) in
      this fusion context — batch-dependent, counted per buffer touched;
    - the gather kernel's (n, L, d) embedding block is double-buffered.

    Per-pair-row temporaries (l·d·4 bytes each): the resident kernel-A
    body measures ~7 live rows + 4 rows of double-buffered in/out tiles;
    kernel B adds ~7 more (its FFN hidden ``f`` is 4d wide = 4 rows).
    """
    stats_bytes = b * l * 3 * d * 4
    row = l * d * 4

    def pick(live_rows: int, extra: int) -> int:
        budget = _VMEM_SCOPE - _VMEM_MARGIN - extra
        pt = max(1, budget // (live_rows * row))
        pt = int(min(pt, p, 16))
        pt = 1 << (pt.bit_length() - 1)  # power of two
        return max(1, pt // 2) if highest else pt

    def pin(v: int, auto: int) -> int:
        return v or auto

    o0, om, oz = overrides
    # P0's unrolled gather slices + concat measured ~25 row-equivalents on
    # chip at pt=4 (vs kernel A's ~11): each of the 2·pt dynamic (1, L, d)
    # loads plus the concatenation materialize separately.
    pt0 = pin(o0, pick(26, 2 * emb_bytes + stats_bytes))
    ptm = pin(om, pick(18, 2 * stats_bytes))
    # kernel Z carries the full kernel-B live set (FFN hidden = 4 rows) +
    # the head; pt=16 measured 21.4M scoped with pre-expanded weights
    # (round-4 bench compile) — 16 rows lands it on pt=8, which compiles
    ptz = pin(oz, pick(16, stats_bytes))
    pt_pad = max(pt0, ptm, ptz)
    return pt0, ptm, ptz, pt_pad


def _env_pt(name: str) -> int:
    import os

    v = int(os.environ.get(name, "0"))
    if v < 0 or (v & (v - 1)):
        raise ValueError(f"{name}={v}: must be 0 (auto) or a power of two")
    return v


def forward_fused_pipeline(
    params: Dict[str, Any],
    codes: jax.Array,
    n_seqs: int,
    site_mask: jax.Array,
    seq_mask: jax.Array,
    n_heads: int = 4,
    eps: float = 1e-5,
    interpret: bool = False,
    mxu_precision: str = "default",
    act_dtype_name: str = "float32",
    gelu_mode: str = "exact",
) -> jax.Array:
    """Full Phyloformer forward through the pipelined kernels.

    Args:
      params: model pytree (embed/layers/head).
      codes: ``(B, n, L)`` int32 alignment codes.
      site_mask: ``(B, L)`` bool. seq_mask: ``(B, n)`` bool.
      act_dtype_name: storage dtype of the inter-kernel activations
        ("float32" | "bfloat16").  Compute is fp32 in-register either way.
      gelu_mode: FFN activation variant ("exact" | "tanh" | "sigmoid" |
        "relu").  "exact" (default) matches the reference's erf GELU
        (`/root/reference/phyloformer/model.py:69-85`); "tanh" is the
        torch-style approximation — fewer VPU transcendentals on the
        VPU-bound merged kernels, gated end-to-end by the bench accuracy
        gate (see bench.py / docs/performance.md round 5).

    Returns:
      ``(B, P)`` distances, P = n(n-1)/2 (upper-triangle order).

    This thin wrapper reads the probe env knobs (PF_PIPE_GATHER,
    PF_PIPE_NO_PREEXPAND, PF_PIPE_PT0/PTM/PTZ) *outside* the jit trace and
    passes them as static arguments, so changing them in-process after a
    shape has compiled takes effect (they are part of the jit cache key).
    """
    import os

    env_opts = (
        os.environ.get("PF_PIPE_GATHER") == "1",
        os.environ.get("PF_PIPE_NO_PREEXPAND") == "1",
        _env_pt("PF_PIPE_PT0"), _env_pt("PF_PIPE_PTM"), _env_pt("PF_PIPE_PTZ"),
    )
    return _forward_pipeline_jit(
        params, codes, n_seqs, site_mask, seq_mask, n_heads=n_heads, eps=eps,
        interpret=interpret, mxu_precision=mxu_precision,
        act_dtype_name=act_dtype_name, gelu_mode=gelu_mode,
        env_opts=env_opts)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "eps", "interpret", "mxu_precision",
                     "act_dtype_name", "n_seqs", "gelu_mode", "env_opts"),
)
def _forward_pipeline_jit(
    params: Dict[str, Any],
    codes: jax.Array,
    n_seqs: int,
    site_mask: jax.Array,
    seq_mask: jax.Array,
    n_heads: int,
    eps: float,
    interpret: bool,
    mxu_precision: str,
    act_dtype_name: str,
    gelu_mode: str,
    env_opts,
) -> jax.Array:
    use_gather_env, no_preexpand, o_pt0, o_ptm, o_ptz = env_opts
    prec = (
        jax.lax.Precision.HIGHEST
        if mxu_precision.lower() in ("highest", "float32")
        else jax.lax.Precision.DEFAULT
    )
    act_dtype = jnp.bfloat16 if act_dtype_name == "bfloat16" else jnp.float32
    b, n, l = codes.shape
    d = params["head"]["w"].shape[0]
    i_idx, j_idx = pair_indices(n_seqs)
    p = len(i_idx)

    # per-sequence embedding: one-hot ⊗ conv1x1 as a table lookup + ReLU
    # (`/root/reference/phyloformer/model.py:138-143,173`)
    emb = jax.nn.relu(
        jnp.take(params["embed"]["w"], codes, axis=0) + params["embed"]["b"]
    )  # (B, n, L, d) fp32

    pair_mask = (jnp.take(seq_mask, jnp.asarray(i_idx), axis=1)
                 & jnp.take(seq_mask, jnp.asarray(j_idx), axis=1))  # (B, P)

    emb_bytes = n * l * d * 4
    pt0, ptm, ptz, pt_pad = _pipeline_tiles(
        b, p, l, d, prec == jax.lax.Precision.HIGHEST, emb_bytes,
        overrides=(o_pt0, o_ptm, o_ptz))
    p_pad = -(-p // pt_pad) * pt_pad
    if p_pad != p:
        pair_mask = jnp.pad(pair_mask, ((0, 0), (0, p_pad - p)))

    site_mask3 = site_mask[:, :, None].astype(jnp.float32)  # (B, L, 1)
    pair_mask4 = pair_mask[:, :, None, None].astype(jnp.float32)
    pair_count = jnp.sum(pair_mask.astype(jnp.float32), axis=1)[:, None]

    def tile(pt):
        return pl.BlockSpec((1, pt, l, d), lambda bi, pi: (bi, pi, 0, 0),
                            memory_space=pltpu.VMEM)

    def pmask_spec(pt):
        return pl.BlockSpec((1, pt, 1, 1), lambda bi, pi: (bi, pi, 0, 0),
                            memory_space=pltpu.VMEM)

    smask_spec = pl.BlockSpec((1, l, 1), lambda bi, pi: (bi, 0, 0),
                              memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, l, 3 * d), lambda bi, pi: (bi, 0, 0),
                              memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    # q/k weights pre-expanded to the d-wide layout: removes the 6
    # head-expansion MXU passes per merged kernel (φ commutes with
    # repetition — exact).  PF_PIPE_NO_PREEXPAND=1 restores the 3-pass
    # form for A/B probing.
    layers = params["layers"]
    if not no_preexpand:
        layers = [expand_qk_weights(ly) for ly in layers]
    x1_shape = jax.ShapeDtypeStruct((b, p_pad, l, d), act_dtype)
    stats_shape = jax.ShapeDtypeStruct((b, l, 3 * d), jnp.float32)

    # ---- stage 1: pair build + block-0 kernel A -------------------------
    a0 = list(_row_params(layers[0])) + list(_col_params(layers[0]))
    # in-kernel gather needs the emb block VMEM-resident and the pair
    # index arrays in SMEM (8 bytes per padded pair).  Default OFF on
    # hardware: Mosaic materializes an extra stack copy of the emb block
    # for the dynamic-index loads on this toolchain (round-4 probe:
    # 16.07M scoped at pt=4 where the block math says ~11M), so the
    # XLA-gather head currently compiles where this doesn't.
    # PF_PIPE_GATHER=1 re-enables for probing.
    use_gather = (emb_bytes <= _P0_EMB_BUDGET_BYTES and p_pad <= 8192
                  and (interpret or use_gather_env))
    if use_gather:
        ii = jnp.zeros((1, p_pad), jnp.int32).at[0, :p].set(jnp.asarray(i_idx))
        jj = jnp.zeros((1, p_pad), jnp.int32).at[0, :p].set(jnp.asarray(j_idx))
        emb_spec = pl.BlockSpec((1, n, l, d), lambda bi, pi: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        x1, stats = pl.pallas_call(
            functools.partial(_kernel_p0, pt=pt0, n_heads=n_heads, eps=eps,
                              prec=prec, interpret=interpret),
            grid=(b, p_pad // pt0),
            in_specs=[emb_spec, smem, smem, smask_spec, pmask_spec(pt0)]
            + [full] * len(a0),
            out_specs=(tile(pt0), stats_spec),
            out_shape=(x1_shape, stats_shape),
            interpret=interpret,
        )(emb, ii, jj, site_mask3, pair_mask4, *a0)
    else:
        # XLA gather fallback: materialize the pair tensor once (storage
        # dtype) and run plain kernel A on it.  The embedding is cast
        # BEFORE the gathers so the two take() intermediates are storage-
        # width (fp32 takes at (200, 1000) cost 2 x 5.2 GB transients —
        # the round-4 HBM-OOM at that corner).
        emb_s = emb.astype(act_dtype)
        x0 = (jnp.take(emb_s, jnp.asarray(i_idx), axis=1)
              + jnp.take(emb_s, jnp.asarray(j_idx), axis=1))
        if p_pad != p:
            x0 = jnp.pad(x0, ((0, 0), (0, p_pad - p), (0, 0), (0, 0)))
        # x0 aliases into x1: each grid step reads its tile once then
        # writes the same tile slot, so in-place is exact — and the whole
        # pipeline then flows through ONE (B, P, L, d) buffer instead of
        # one per dispatch (XLA does not reuse pallas outputs otherwise).
        x1, stats = pl.pallas_call(
            functools.partial(_kernel_a_only, n_heads=n_heads, eps=eps,
                              prec=prec, interpret=interpret),
            grid=(b, p_pad // ptm),
            in_specs=[tile(ptm), smask_spec, pmask_spec(ptm)]
            + [full] * len(a0),
            out_specs=(tile(ptm), stats_spec),
            out_shape=(x1_shape, stats_shape),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(x0, site_mask3, pair_mask4, *a0)

    # ---- stage 2: merged block boundaries -------------------------------
    for i in range(len(layers) - 1):
        m_params = (list(_b_params(layers[i])) + list(_row_params(layers[i + 1]))
                    + list(_col_params(layers[i + 1])))
        x1, stats = pl.pallas_call(
            functools.partial(_kernel_m, n_heads=n_heads, eps=eps,
                              prec=prec, interpret=interpret,
                              gelu=gelu_mode),
            grid=(b, p_pad // ptm),
            in_specs=[tile(ptm), stats_spec, smask_spec, pmask_spec(ptm),
                      smem] + [full] * len(m_params),
            out_specs=(tile(ptm), stats_spec),
            out_shape=(x1_shape, stats_shape),
            # x1 in-place (read-then-write per tile; stats must NOT alias:
            # later grid steps still read the incoming stats)
            input_output_aliases={0: 0},
            interpret=interpret,
        )(x1, stats, site_mask3, pair_mask4, pair_count, *m_params)

    # ---- stage 3: final kernel B + head ---------------------------------
    z_params = list(_b_params(layers[-1])) + [params["head"]["w"],
                                              params["head"]["b"]]
    out = pl.pallas_call(
        functools.partial(_kernel_z, n_heads=n_heads, eps=eps, prec=prec,
                          interpret=interpret, gelu=gelu_mode),
        grid=(b, p_pad // ptz),
        in_specs=[tile(ptz), stats_spec, smask_spec, smem]
        + [full] * len(z_params),
        out_specs=pl.BlockSpec((1, ptz, 1, 1), lambda bi, pi: (bi, pi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, 1, 1), jnp.float32),
        interpret=interpret,
    )(x1, stats, site_mask3, pair_count, *z_params)

    return out[:, :p, 0, 0]


def pipeline_supported(n_seqs: int, seq_len: int, mxu_precision: str) -> bool:
    """True when the pipelined kernels serve this bucket shape (resident
    site axis).  Longer site axes keep the two-pass L-tiled path."""
    cap = (_RESIDENT_SITES_MAX_HI
           if mxu_precision.lower() in ("highest", "float32")
           else _RESIDENT_SITES_MAX)
    return seq_len <= cap
