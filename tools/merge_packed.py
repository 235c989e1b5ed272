"""Merge several pf-preprocess shard dirs into one corpus dir.

The mixed-length pretraining corpus is preprocessed per length class
(pf-preprocess per L so tree/alignment stems pair within each class); the
bucketed packed loader takes ONE dir, so this tool hard-links the shards
under unique names and writes a combined manifest.

Usage: python tools/merge_packed.py OUT_DIR SRC_DIR [SRC_DIR ...]
"""

import json
import os
import sys
from pathlib import Path


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    out = Path(argv[0])
    out.mkdir(parents=True, exist_ok=True)
    manifest = {"n_examples": 0, "shards": []}
    for src_i, src in enumerate(map(Path, argv[1:])):
        src_manifest = json.loads((src / "manifest.json").read_text())
        for shard in src_manifest["shards"]:
            new = f"m{src_i}_{shard}"
            for ext in (".codes.npy", ".dists.npy", ".index.json"):
                dst = out / f"{new}{ext}"
                if dst.exists():
                    dst.unlink()
                os.link(src / f"{shard}{ext}", dst)
            manifest["shards"].append(new)
        manifest["n_examples"] += src_manifest["n_examples"]
    (out / "manifest.json").write_text(json.dumps(manifest))
    print(f"merged {len(manifest['shards'])} shards, "
          f"{manifest['n_examples']} examples -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
