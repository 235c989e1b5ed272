"""On-chip probe for the pipelined fused kernels (ops/pallas/pipeline.py).

Compiles the pipeline at a given (batch, tips, sites), checks accuracy
against the fp32 goldens on real testdata (when shapes match), and times
the steady state with D2H-synced walls (block_until_ready does not
synchronize through the axon relay).

Usage: python tools/bench_pipeline.py [--batch 9] [--tips 60] [--sites 256]
       [--act-dtype float32] [--precision default] [--iters 8] [--goldens]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=9)
    ap.add_argument("--tips", type=int, default=60)
    ap.add_argument("--sites", type=int, default=256)
    ap.add_argument("--act-dtype", default="float32")
    ap.add_argument("--precision", default="default",
                    help="kernel matmul passes: default|highest")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--gelu", default="exact",
                    help="FFN activation: exact|tanh|sigmoid|relu")
    ap.add_argument("--goldens", action="store_true",
                    help="accuracy vs tests/goldens on real testdata")
    ap.add_argument("--old-path", action="store_true",
                    help="time forward_fused (per-block kernels) instead")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from phyloformer_tpu.io import load_pretrained
    from phyloformer_tpu.models.phyloformer import forward_fused
    from phyloformer_tpu.ops.pallas.pipeline import forward_fused_pipeline

    params, cfg, _ = load_pretrained("/root/reference/models/pf.ckpt")
    params = jax.device_put(params)
    b, n, l = args.batch, args.tips, args.sites
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 20, (b, n, l)).astype(np.int32))
    site_mask = jnp.ones((b, l), bool)
    seq_mask = jnp.ones((b, n), bool)

    if args.old_path:
        import dataclasses

        cfg2 = dataclasses.replace(
            cfg, matmul_precision="float32" if args.precision == "highest"
            else "tensorfloat32")

        def fn(p, c, sm, qm):
            return forward_fused(p, c, cfg2, site_mask=sm, seq_mask=qm)
    else:
        def fn(p, c, sm, qm):
            return forward_fused_pipeline(
                p, c, n, sm, qm, n_heads=cfg.n_heads, eps=cfg.ln_eps,
                mxu_precision=args.precision,
                act_dtype_name=args.act_dtype, gelu_mode=args.gelu)

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = np.asarray(jfn(params, codes, site_mask, seq_mask))  # compile+D2H
    t_compile = time.perf_counter() - t0
    assert np.isfinite(out).all(), "non-finite output"
    print(f"# compiled+first call in {t_compile:.1f}s out={out.shape}")

    # steady state: D2H sync each iter
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = np.asarray(jfn(params, codes, site_mask, seq_mask))
        times.append(time.perf_counter() - t0)
    per_call = min(times)
    print(f"# per-call {per_call*1e3:.1f} ms  -> {b/per_call:.1f} aln/s "
          f"(batch {b}, {n}x{l}, {args.act_dtype}, {args.precision})")

    if args.goldens:
        from phyloformer_tpu.data import read_fasta

        g = np.load("/root/repo/tests/goldens/pf_preds_testdata.npz")
        errs = []
        for i in range(3):
            a = read_fasta(f"/root/reference/data/testdata/msas/{i}_40_tips.fa")
            pad_codes = np.zeros((1, n, l), np.int32)
            pad_codes[0, :a.n_seqs, :a.seq_len] = a.codes
            sm = np.zeros((1, l), bool)
            sm[0, :a.seq_len] = True
            qm = np.zeros((1, n), bool)
            qm[0, :a.n_seqs] = True
            pred = np.asarray(jfn(params, jnp.asarray(pad_codes),
                                  jnp.asarray(sm), jnp.asarray(qm)))[0]
            from phyloformer_tpu.infer.engine import real_pair_selector

            sel = real_pair_selector(n, a.n_seqs)
            errs.append(np.abs(pred[sel] - g[f"{i}_40_tips"]).max())
        print(f"# goldens max-abs err {max(errs):.2e} (gate 6e-3)")


if __name__ == "__main__":
    main()
