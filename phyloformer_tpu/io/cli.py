"""Checkpoint interop CLI.

    pf-ckpt inspect <ckpt|npz|orbax-dir>          # summarize any container
    pf-ckpt export <src> <out.ckpt>               # -> reference torch format
    pf-ckpt convert <src> <out.npz>               # -> our npz params

``export`` writes a PyTorch zip checkpoint (torch-free writer,
:mod:`.torch_pickle`) with the reference's exact state-dict schema, so
checkpoints fine-tuned on TPU drop back into the reference tooling
(`/root/reference/infer_alns.py:71-82`, verified against torch.load and the
reference model code in tests/test_ckpt_export.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pf-ckpt")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_i = sub.add_parser("inspect", help="summarize a checkpoint")
    p_i.add_argument("path")

    p_e = sub.add_parser("export", help="write a reference-format torch .ckpt")
    p_e.add_argument("src", help="source: torch .ckpt, .npz, or orbax dir")
    p_e.add_argument("out")
    p_e.add_argument("--no-seq2pair", action="store_true",
                     help="omit the non-learnable seq2pair buffer")

    p_c = sub.add_parser("convert", help="write our .npz params container")
    p_c.add_argument("src")
    p_c.add_argument("out")

    args = p.parse_args(argv)

    from .ckpt_import import load_pretrained

    params, cfg, meta = load_pretrained(args.src if args.cmd != "inspect" else args.path)

    if args.cmd == "inspect":
        import numpy as np

        n_params = sum(int(np.asarray(x).size) for x in _leaves(params))
        print(json.dumps({
            "config": {"n_blocks": cfg.n_blocks, "n_heads": cfg.n_heads,
                       "embed_dim": cfg.embed_dim, "dropout": cfg.dropout},
            "learnable_params": n_params,
            "metadata_keys": sorted(str(k) for k in meta)[:20],
        }, indent=2))
        return 0

    if args.cmd == "export":
        from .ckpt_import import save_reference_checkpoint

        save_reference_checkpoint(
            args.out, params, cfg, include_seq2pair=not args.no_seq2pair
        )
        print(f"wrote reference-format checkpoint -> {args.out}", file=sys.stderr)
        return 0

    if args.cmd == "convert":
        from .checkpoint import save_params_npz

        save_params_npz(args.out, params)
        print(f"wrote params npz -> {args.out}", file=sys.stderr)
        return 0

    return 2


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    sys.exit(main())
