"""pf-serve — long-lived inference service.

    pf-serve models/pf.ckpt --port 8000 [--precision tensorfloat32]
        [--batch-window-ms 20] [--pallas]

Endpoints: POST /predict (FASTA body → distances JSON / ?format=phylip /
?tree=nj), GET /healthz.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pf-serve")
    p.add_argument("weights")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--precision", default="tensorfloat32",
                   choices=["float32", "tensorfloat32", "default"])
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--batch-window-ms", type=float, default=20.0)
    p.add_argument("--batch-tokens", type=int, default=1 << 23)
    p.add_argument("--mesh-data", type=int, default=None,
                   help="serve over a ('data','pair') device mesh: data-axis "
                        "size (default: all devices / --mesh-pair)")
    p.add_argument("--mesh-pair", type=int, default=1,
                   help="pair-axis mesh size — shards the quadratic pair "
                        "activation axis for alignments beyond one chip's HBM")
    args = p.parse_args(argv)

    from ..infer.engine import InferenceConfig, InferenceEngine, ShardedInferenceEngine
    from ..io.ckpt_import import load_pretrained
    from .server import InferenceServer

    params, cfg, _ = load_pretrained(args.weights)
    icfg = InferenceConfig(
        matmul_precision=args.precision,
        use_pallas=args.pallas,
        max_batch_tokens=args.batch_tokens,
        # bound jit retraces under bursty request loads (padding rows are
        # masked no-ops; a fresh compile per batch size would stall the
        # service for minutes on cold shapes)
        pad_batch_sizes=True,
    )
    # mesh only when explicitly requested (matches pf-infer semantics —
    # `--mesh-data 1 --mesh-pair 1` or no flags serves on one device even
    # on a multi-device host)
    if (args.mesh_data is not None and args.mesh_data > 1) or args.mesh_pair > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, pair=args.mesh_pair)
        print(f"pf-serve mesh: {dict(mesh.shape)}", file=sys.stderr)
        engine = ShardedInferenceEngine(params, cfg, mesh, icfg)
    else:
        engine = InferenceEngine(params, cfg, icfg)
    info = {
        "model": args.weights,
        "n_blocks": cfg.n_blocks,
        "embed_dim": cfg.embed_dim,
        "precision": args.precision,
    }
    server = InferenceServer(engine, info, host=args.host, port=args.port,
                             batch_window_ms=args.batch_window_ms)
    print(f"pf-serve listening on {args.host}:{server.port}", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
