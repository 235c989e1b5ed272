"""Multi-chip fused inference: Pallas kernels inside ``shard_map``.

The single-chip fused forward streams the quadratic pair axis through VMEM
tiles, but the activations ``(B, P, L, d)`` still live in one chip's HBM —
at the reference grid corner (200 tips x 1000 sites, P = 19,900) that is
~5 GB per tensor and exceeds a v5e's memory on every single-chip path.

Linear attention makes the multi-chip version exact and cheap: the column
(pair-axis) attention depends on the pair axis ONLY through the running
sums Σk, Σq, Σk·v that forward kernel A already accumulates.  So under
``shard_map`` over the mesh 'pair' axis each device:

1. gathers its own pair-block ``x = emb[i_k] + emb[j_k]`` from the
   (tiny, replicated) per-sequence embeddings;
2. runs kernel A on its local pair shard;
3. ``psum``s the (B, L, 3d) stats over 'pair' — the ONLY communication,
   ~L*3d floats per block (0.2 MB at L=1000) vs ~GBs of activations;
4. runs kernel B locally; the head reduces over sites locally too.

The batch axis shards over 'data' the same way.  Output: ``(B, P)`` with
the pair axis sharded; callers device_get it (or all-gather if needed).

Numerics equal the single-chip fused path (same kernels, same sums —
the psum just adds the per-shard partials in mesh order).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ...data.pairs import pair_indices
from .axial_block import fused_kernel_a
from .axial_block_bwd import fused_axial_block_bwd


def forward_fused_sharded(
    params,
    codes: jax.Array,
    cfg,
    mesh,
    site_mask: Optional[jax.Array] = None,
    seq_mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused-kernel forward with batch over 'data' and the activation pair
    axis over 'pair'.  Returns ``(B, P_pad)`` distances laid out with the
    pair axis sharded over 'pair' (``P_pad`` = P rounded up to the shard
    multiple; callers slice back to P and select real pairs).
    """
    from jax.experimental.shard_map import shard_map

    from ...models.phyloformer import embed_alignment, pair_mask_from_seq_mask

    b, n_seqs, seq_len = codes.shape
    if site_mask is None:
        site_mask = jnp.ones((b, seq_len), bool)
    if seq_mask is None:
        seq_mask = jnp.ones((b, n_seqs), bool)

    npair = mesh.shape["pair"]
    i_idx, j_idx = pair_indices(n_seqs)
    p = len(i_idx)
    p_pad = -(-p // npair) * npair
    # padding pairs point at sequence 0; they are masked out of the stats
    i_pad = np.zeros(p_pad, np.int32)
    j_pad = np.zeros(p_pad, np.int32)
    i_pad[:p], j_pad[:p] = i_idx, j_idx
    pair_mask = pair_mask_from_seq_mask(seq_mask, n_seqs)  # (B, P)
    pair_mask = jnp.pad(pair_mask, ((0, 0), (0, p_pad - p)))

    mxu_precision = "highest" if cfg.matmul_precision == "float32" else "default"

    def local_forward(emb, smask, pmask_local, i_loc, j_loc):
        # emb: (b_loc, n, L, d) replicated over 'pair'; indices: this
        # shard's pair rows.  Build the local pair block by gather-add.
        x = jnp.take(emb, i_loc, axis=1) + jnp.take(emb, j_loc, axis=1)
        for layer in params["layers"]:
            # kernel A on the local shard: x1 + this shard's stat partials
            x1, stats_local = fused_kernel_a(
                x, layer, smask, pmask_local, cfg.n_heads, cfg.ln_eps,
                interpret, mxu_precision,
            )
            # sole cross-shard communication: the linear-attention sums
            stats = jax.lax.psum(stats_local, "pair")
            count = jax.lax.psum(
                jnp.sum(pmask_local.astype(jnp.float32), axis=1), "pair"
            )
            x = _kernel_b_host(
                x1, stats, count, layer, cfg.n_heads, cfg.ln_eps,
                interpret, mxu_precision,
            )
        h = x @ params["head"]["w"] + params["head"]["b"]
        h = jax.nn.softplus(h)[..., 0]
        m = smask[:, None, :].astype(h.dtype)
        return jnp.sum(h * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)

    def sharded(emb, smask, pmask, i_all, j_all):
        # slice this device's pair block (indices are replicated; the data
        # arrays arrive pre-sharded per the in_specs)
        k = jax.lax.axis_index("pair")
        per = p_pad // npair
        i_loc = jax.lax.dynamic_slice(i_all, (k * per,), (per,))
        j_loc = jax.lax.dynamic_slice(j_all, (k * per,), (per,))
        return local_forward(emb, smask, pmask, i_loc, j_loc)

    with jax.default_matmul_precision(cfg.matmul_precision):
        emb = embed_alignment(params, codes)  # (B, n, L, d) — tiny
        fn = shard_map(
            sharded,
            mesh=mesh,
            in_specs=(
                P("data", None, None, None),  # emb: batch-sharded only
                P("data", None),  # site mask
                P("data", "pair"),  # pair mask: this shard's rows
                P(None),  # pair indices replicated
                P(None),
            ),
            out_specs=P("data", "pair"),
            check_rep=False,
        )
        return fn(emb, site_mask, pair_mask,
                  jnp.asarray(i_pad), jnp.asarray(j_pad))


def sharded_fused_loss_and_grads(
    params,
    batch,
    cfg,
    mesh,
    loss_name: str = "mae",
    interpret: bool = False,
):
    """Fully-fused multi-chip TRAINING: one ``shard_map`` computes the
    masked loss and every parameter gradient with the fused Pallas kernels,
    batch over 'data' and the activation pair axis over 'pair'.

    The backward is written out manually (no ``jax.grad``): per block the
    forward residuals (x, x1, global stats) stay on their shard, the
    analytic backward kernels (C/D/E) run shard-locally, and the ONLY
    cross-shard traffic is the per-block stats psum (forward), the A1 psum
    (backward) and one final psum of the parameter gradients — exactly the
    collectives a hand-tuned multi-chip trainer would issue.  Enables
    training at (n, L) whose activations exceed single-chip HBM.

    Returns ``(loss, grads)`` with both replicated.
    """
    from jax.experimental.shard_map import shard_map

    codes = batch["codes"]
    b, n_seqs, seq_len = codes.shape
    site_mask = batch.get("site_mask")
    seq_mask = batch.get("seq_mask")
    if site_mask is None:
        site_mask = jnp.ones((b, seq_len), bool)
    if seq_mask is None:
        seq_mask = jnp.ones((b, n_seqs), bool)

    npair = mesh.shape["pair"]
    i_idx, j_idx = pair_indices(n_seqs)
    p_real = len(i_idx)
    p_pad = -(-p_real // npair) * npair
    i_pad = np.zeros(p_pad, np.int32)
    j_pad = np.zeros(p_pad, np.int32)
    i_pad[:p_real], j_pad[:p_real] = i_idx, j_idx
    dists = jnp.pad(batch["dists"], ((0, 0), (0, p_pad - p_real)))

    mxu = "highest" if cfg.matmul_precision == "float32" else "default"
    n_heads, eps = cfg.n_heads, cfg.ln_eps
    axes = ("data", "pair")

    def local(params, codes, dists_l, smask, sqmask, i_all, j_all):
        k = jax.lax.axis_index("pair")
        per = p_pad // npair
        i_loc = jax.lax.dynamic_slice(i_all, (k * per,), (per,))
        j_loc = jax.lax.dynamic_slice(j_all, (k * per,), (per,))
        # padding pairs (appended zeros) must be masked even when they
        # alias real sequence 0: mask by global pair position
        pos = k * per + jnp.arange(per)
        pmask = (
            jnp.take(sqmask, i_loc, axis=1)
            & jnp.take(sqmask, j_loc, axis=1)
            & (pos < p_real)[None, :]
        )

        # ---- forward (residuals stay local) ----
        z = jnp.take(params["embed"]["w"], codes, axis=0) + params["embed"]["b"]
        emb = jax.nn.relu(z)  # (b_loc, n, L, d)
        x = jnp.take(emb, i_loc, axis=1) + jnp.take(emb, j_loc, axis=1)
        count = jax.lax.psum(
            jnp.sum(pmask.astype(jnp.float32), axis=1), "pair"
        )  # (b_loc,) global pair count
        res = []
        for layer in params["layers"]:
            x1, st_loc = fused_kernel_a(x, layer, smask, pmask, n_heads, eps,
                                        interpret, mxu)
            st = jax.lax.psum(st_loc, "pair")
            res.append((x, x1, st))
            x = _kernel_b_host(x1, st, count, layer, n_heads, eps, interpret,
                               mxu)

        wh, bh = params["head"]["w"], params["head"]["b"]
        hpre = x @ wh + bh  # (b_loc, P_loc, L, 1)
        sp = jax.nn.softplus(hpre)[..., 0]
        m = smask[:, None, :].astype(sp.dtype)
        scount = jnp.maximum(jnp.sum(m, axis=-1), 1.0)  # (b_loc, 1)
        preds = jnp.sum(sp * m, axis=-1) / scount  # (b_loc, P_loc)

        # ---- masked loss + its cotangent (matches train/losses.py) ----
        pm = pmask.astype(preds.dtype)
        err = preds - dists_l
        n_tot = jnp.maximum(jax.lax.psum(jnp.sum(pm), axes), 1.0)
        if loss_name in ("mae", "l1"):
            loss = jax.lax.psum(jnp.sum(jnp.abs(err) * pm), axes) / n_tot
            dpreds = jnp.sign(err) * pm / n_tot
        elif loss_name == "mre":
            w = pm / (dists_l + 1e-8)
            loss = jax.lax.psum(jnp.sum(jnp.abs(err) * w), axes) / n_tot
            dpreds = jnp.sign(err) * w / n_tot
        elif loss_name == "mse":
            loss = jax.lax.psum(jnp.sum(err * err * pm), axes) / n_tot
            dpreds = 2.0 * err * pm / n_tot
        else:
            raise ValueError(f"unsupported loss {loss_name!r}")

        # ---- manual backward ----
        d_sp = dpreds[:, :, None] * m / scount[:, :, None]  # (b,P_loc,L)
        d_hpre = d_sp[..., None] * jax.nn.sigmoid(hpre)
        dwh = jnp.einsum("bpld,bplo->do", x, d_hpre)
        dbh = jnp.sum(d_hpre, axis=(0, 1, 2))
        g = jnp.einsum("bplo,do->bpld", d_hpre, wh)

        dlayers = []
        for layer, (x0, x1, st) in zip(reversed(params["layers"]),
                                       reversed(res)):
            g, dlayer = fused_axial_block_bwd(
                x0, x1, st, g, layer, smask, pmask, n_heads, eps, interpret,
                mxu, pair_count=count[:, None], psum_axis="pair",
            )
            dlayers.append(dlayer)
        dlayers.reverse()

        demb = jnp.zeros_like(emb)
        demb = demb.at[:, i_loc].add(g)
        demb = demb.at[:, j_loc].add(g)
        dz = demb * (z > 0)
        d = dz.shape[-1]
        dW = jnp.zeros_like(params["embed"]["w"]).at[
            codes.reshape(-1)
        ].add(dz.reshape(-1, d))
        db = jnp.sum(dz, axis=(0, 1, 2))

        grads = {
            "embed": {"w": dW, "b": db},
            "layers": dlayers,
            "head": {"w": dwh, "b": dbh},
        }
        grads = jax.lax.psum(grads, axes)
        return loss, grads

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),  # params replicated
            P("data", None, None),  # codes
            P("data", "pair"),  # dists (pair-padded)
            P("data", None),  # site mask
            P("data", None),  # seq mask
            P(None),  # pair indices
            P(None),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    with jax.default_matmul_precision(cfg.matmul_precision):
        return fn(params, codes, dists, site_mask, seq_mask,
                  jnp.asarray(i_pad), jnp.asarray(j_pad))


def _kernel_b_host(x1, stats, pair_count, layer, n_heads, eps, interpret,
                   mxu_precision):
    """Kernel B (column attention finalize + FFN) on a local shard given the
    GLOBAL stats — the tail of ``_fused_block_impl`` with the stats psum'd
    outside."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .axial_block import (
        _RESIDENT_SITES_MAX,
        _RESIDENT_SITES_MAX_HI,
        _kernel_b,
        _ltiled_tiles,
        _pick_tile,
    )

    prec = (
        jax.lax.Precision.HIGHEST
        if mxu_precision.lower() in ("highest", "float32")
        else jax.lax.Precision.DEFAULT
    )
    b, p, l, d = x1.shape
    resident_max = (
        _RESIDENT_SITES_MAX_HI
        if prec == jax.lax.Precision.HIGHEST
        else _RESIDENT_SITES_MAX
    )
    if l <= resident_max:
        lt = l
        pt = _pick_tile(p, l, d, highest=prec == jax.lax.Precision.HIGHEST)
    else:  # L-tiled: same per-site kernel B, extra site grid dimension
        pt, lt = _ltiled_tiles(p, l)
    l_pad = -(-l // lt) * lt
    p_pad = -(-p // pt) * pt
    if p_pad != p or l_pad != l:
        x1 = jnp.pad(x1, ((0, 0), (0, p_pad - p), (0, l_pad - l), (0, 0)))
        stats = jnp.pad(stats, ((0, 0), (0, l_pad - l), (0, 0)))
    grid = (b, p_pad // pt, l_pad // lt)
    tile_spec = pl.BlockSpec(
        (1, pt, lt, d), lambda bi, pi, li: (bi, pi, li, 0),
        memory_space=pltpu.VMEM,
    )
    stats_spec = pl.BlockSpec(
        (1, lt, 3 * d), lambda bi, pi, li: (bi, li, 0),
        memory_space=pltpu.VMEM,
    )
    pmask_spec = pl.BlockSpec(
        (1, pt, 1, 1), lambda bi, pi, li: (bi, pi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    count_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    ca = layer["col_attn"]
    ffn = layer["ffn"]
    b_params = [
        layer["col_norm"]["scale"], layer["col_norm"]["bias"],
        ca["wq"], ca["bq"], ca["wo"], ca["bo"],
        layer["ffn_norm"]["scale"], layer["ffn_norm"]["bias"],
        ffn["w1"], ffn["b1"], ffn["w2"], ffn["b2"],
    ]
    dummy_pmask = jnp.ones((b, p_pad, 1, 1), jnp.float32)  # unused by B
    x3 = pl.pallas_call(
        functools.partial(_kernel_b, n_heads=n_heads, eps=eps, prec=prec,
                          interpret=interpret),
        grid=grid,
        in_specs=[tile_spec, stats_spec, pmask_spec, count_spec]
        + [full() for _ in b_params],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((b, p_pad, l_pad, d), x1.dtype),
        interpret=interpret,
    )(x1, stats, dummy_pmask, pair_count[:, None], *b_params)
    if p_pad != p or l_pad != l:
        x3 = x3[:, :p, :l]
    return x3
