"""Per-stage timing of the pipelined kernels: embed+gather+A | one M | Z.

Times each pallas_call in isolation (jitted separately, D2H-synced) so the
245 ms whole-pipeline wall at the headline shape decomposes into stage
costs.  Pure probe tool; not part of the library surface.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=8):
    out = np.asarray(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax_tree_first(r))
        times.append(time.perf_counter() - t0)
    return min(times), out


def jax_tree_first(r):
    import jax

    return jax.tree_util.tree_leaves(r)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=9)
    ap.add_argument("--tips", type=int, default=60)
    ap.add_argument("--sites", type=int, default=256)
    ap.add_argument("--act-dtype", default="float32")
    ap.add_argument("--ptm", type=int, default=0)
    args = ap.parse_args()

    import os

    if args.ptm:
        os.environ["PF_PIPE_PTM"] = str(args.ptm)

    import jax
    import jax.numpy as jnp

    import phyloformer_tpu.ops.pallas.pipeline as pipe
    from phyloformer_tpu.io import load_pretrained

    params, cfg, _ = load_pretrained("/root/reference/models/pf.ckpt")
    params = jax.device_put(params)
    b, n, l = args.batch, args.tips, args.sites
    d = 64
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 20, (b, n, l)).astype(np.int32))
    site_mask = jnp.ones((b, l), bool)
    seq_mask = jnp.ones((b, n), bool)

    # stage A: embed + XLA gather + kernel-A-only  -> (x1, stats)
    @jax.jit
    def stage_a(params, codes, site_mask, seq_mask):
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from phyloformer_tpu.data.pairs import pair_indices

        i_idx, j_idx = pair_indices(n)
        p = len(i_idx)
        act_dtype = (jnp.bfloat16 if args.act_dtype == "bfloat16"
                     else jnp.float32)
        emb = jax.nn.relu(jnp.take(params["embed"]["w"], codes, axis=0)
                          + params["embed"]["b"])
        pair_mask = jnp.ones((b, p), bool)
        pt0, ptm, ptz, pt_pad = pipe._pipeline_tiles(b, p, l, d, False,
                                                     n * l * d * 4)
        p_pad = -(-p // pt_pad) * pt_pad
        pair_mask = jnp.pad(pair_mask, ((0, 0), (0, p_pad - p)))
        x0 = (jnp.take(emb, jnp.asarray(i_idx), axis=1)
              + jnp.take(emb, jnp.asarray(j_idx), axis=1)).astype(act_dtype)
        x0 = jnp.pad(x0, ((0, 0), (0, p_pad - p), (0, 0), (0, 0)))
        site_mask3 = site_mask[:, :, None].astype(jnp.float32)
        pair_mask4 = pair_mask[:, :, None, None].astype(jnp.float32)
        layer = params["layers"][0]
        a0 = (list(pipe._row_params(layer)) + list(pipe._col_params(layer)))
        tile = pl.BlockSpec((1, ptm, l, d), lambda bi, pi: (bi, pi, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(pipe._kernel_a_only, n_heads=4, eps=1e-5,
                              prec=jax.lax.Precision.DEFAULT,
                              interpret=False),
            grid=(b, p_pad // ptm),
            in_specs=[tile,
                      pl.BlockSpec((1, l, 1), lambda bi, pi: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, ptm, 1, 1),
                                   lambda bi, pi: (bi, pi, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a0),
            out_specs=(tile,
                       pl.BlockSpec((1, l, 3 * d), lambda bi, pi: (bi, 0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((b, p_pad, l, d), act_dtype),
                       jax.ShapeDtypeStruct((b, l, 3 * d), jnp.float32)),
        )(x0, site_mask3, pair_mask4, *a0)
        return out

    t_a, _ = timeit(stage_a, params, codes, site_mask, seq_mask)
    print(f"# stage A (embed+gather+kernelA): {t_a*1e3:.1f} ms")

    # full pipeline for reference
    @jax.jit
    def full(params, codes, site_mask, seq_mask):
        return pipe.forward_fused_pipeline(
            params, codes, n, site_mask, seq_mask,
            mxu_precision="default", act_dtype_name=args.act_dtype)

    t_full, _ = timeit(full, params, codes, site_mask, seq_mask)
    print(f"# full pipeline: {t_full*1e3:.1f} ms "
          f"-> per-M-stage ≈ {(t_full - t_a)*1e3/6:.1f} ms (5 M + Z)")


if __name__ == "__main__":
    main()
