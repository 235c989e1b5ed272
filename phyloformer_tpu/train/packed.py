"""Packed training data: preprocess once, memory-map forever.

The reference re-parses FASTA + newick in DataLoader workers every epoch
(`/root/reference/train_distributed.py:189-196`, ``data.py:55-75``) — fine
for small corpora, CPU-bound at production scale (the published models train
on ~10^5 alignments).  This module preprocesses a (tree, alignment) corpus
into flat binary shards:

    shard_<k>.codes.npy   int8  — concatenated (n_i * L_i) alignment codes
    shard_<k>.dists.npy   f32   — concatenated C(n_i, 2) distance vectors
    shard_<k>.index.json  per-example (n, L, codes_offset, dists_offset, id)

Loading is ``np.memmap`` slicing — no parsing, no copies until batch
assembly; the loader streams epochs with the same bucketing/masking
semantics as :class:`phyloformer_tpu.train.data.BucketedLoader`.
"""

from __future__ import annotations

import dataclasses
import json
import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..data.fasta import Alignment
from ..infer.engine import _bucketize
from .data import LoaderConfig, load_example
from .trainer import make_batch


def preprocess(
    pairs: Sequence[Tuple[str, str]],
    out_dir,
    shard_size: int = 512,
    progress: bool = False,
) -> Path:
    """Pack (treefile, alnfile) pairs into binary shards; returns out_dir."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = {"n_examples": 0, "shards": []}
    for shard_id, start in enumerate(range(0, len(pairs), shard_size)):
        chunk = pairs[start : start + shard_size]
        codes_parts: List[np.ndarray] = []
        dists_parts: List[np.ndarray] = []
        index = []
        codes_off = dists_off = 0
        for tree_path, aln_path in chunk:
            aln, vec = load_example(tree_path, aln_path)
            flat = np.ascontiguousarray(aln.codes, dtype=np.int8).reshape(-1)
            vec = np.ascontiguousarray(vec, dtype=np.float32)
            index.append(
                {
                    "n": aln.n_seqs,
                    "L": aln.seq_len,
                    "codes_offset": codes_off,
                    "dists_offset": dists_off,
                    "id": Path(aln_path).stem,
                }
            )
            codes_parts.append(flat)
            dists_parts.append(vec)
            codes_off += flat.size
            dists_off += vec.size
        np.save(out / f"shard_{shard_id}.codes.npy", np.concatenate(codes_parts))
        np.save(out / f"shard_{shard_id}.dists.npy", np.concatenate(dists_parts))
        (out / f"shard_{shard_id}.index.json").write_text(json.dumps(index))
        manifest["shards"].append(f"shard_{shard_id}")
        manifest["n_examples"] += len(index)
        if progress:
            print(f"shard {shard_id}: {len(index)} examples")
    (out / "manifest.json").write_text(json.dumps(manifest))
    return out


class PackedDataset:
    """Memory-mapped random access over a preprocessed corpus."""

    def __init__(self, directory):
        self.dir = Path(directory)
        manifest = json.loads((self.dir / "manifest.json").read_text())
        self._examples: List[Tuple[int, Dict]] = []  # (shard_idx, meta)
        self._codes: List[np.ndarray] = []
        self._dists: List[np.ndarray] = []
        for si, shard in enumerate(manifest["shards"]):
            self._codes.append(np.load(self.dir / f"{shard}.codes.npy", mmap_mode="r"))
            self._dists.append(np.load(self.dir / f"{shard}.dists.npy", mmap_mode="r"))
            for meta in json.loads((self.dir / f"{shard}.index.json").read_text()):
                self._examples.append((si, meta))

    def __len__(self) -> int:
        return len(self._examples)

    def __getitem__(self, i: int):
        si, meta = self._examples[i]
        n, L = meta["n"], meta["L"]
        co, do = meta["codes_offset"], meta["dists_offset"]
        codes = np.asarray(self._codes[si][co : co + n * L]).reshape(n, L)
        vec = np.asarray(self._dists[si][do : do + n * (n - 1) // 2])
        return Alignment(codes=codes, ids=[f"s{k}" for k in range(n)]), vec

    def example_id(self, i: int) -> str:
        return self._examples[i][1]["id"]


class PackedSubset:
    """Index-subset view of a :class:`PackedDataset` (train/val splits)."""

    def __init__(self, dataset: PackedDataset, indices):
        self.ds = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.ds[self.indices[i]]

    def example_id(self, i: int) -> str:
        return self.ds.example_id(self.indices[i])


class PackedBucketedLoader:
    """Bucketed batch iterator over a :class:`PackedDataset` (same batch
    schema as ``BucketedLoader``, no parsing in the loop)."""

    def __init__(self, dataset: PackedDataset, cfg: LoaderConfig):
        self.ds = dataset
        self.cfg = cfg
        self._epoch = 0

    def __len__(self):
        return len(self.ds)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        cfg = self.cfg
        order = list(range(len(self.ds)))
        if cfg.shuffle:
            random.Random(cfg.seed + self._epoch).shuffle(order)
        self._epoch += 1
        buckets: Dict[Tuple[int, int], List] = {}
        for i in order:
            aln, vec = self.ds[i]
            key = (
                _bucketize(aln.n_seqs, cfg.n_buckets, True),
                _bucketize(aln.seq_len, cfg.l_buckets, True),
            )
            buckets.setdefault(key, []).append((aln, vec))
            if len(buckets[key]) >= cfg.bucket_batch_size(*key):
                items = buckets.pop(key)
                yield make_batch([a for a, _ in items], [v for _, v in items], *key)
        if not cfg.drop_last:
            for key in sorted(buckets):
                items = buckets[key]
                if items:
                    yield make_batch([a for a, _ in items], [v for _, v in items], *key)
