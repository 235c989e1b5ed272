"""FASTA reading/writing for protein MSAs.

Reference behavior reproduced (`/root/reference/phyloformer/data.py:11-31`):
- ids are the full header text after ``>`` with surrounding whitespace stripped;
- sequences may span multiple lines;
- the on-tensor layout used by the reference model is ``(22, L, n)``
  (one-hot depth, sites, sequences) — :func:`load_alignment` returns that
  layout for drop-in compatibility, while :func:`read_fasta` returns the
  TPU-native compact form (integer codes ``(n, L)``) that the inference
  engine ships to the device (22x less H2D traffic than one-hot float32).
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass
from typing import List, Tuple, Union

import numpy as np

from .alphabet import ALPHABET_SIZE, decode_codes, encode_bytes, one_hot


@dataclass
class Alignment:
    """A parsed MSA: integer codes ``(n, L)`` int8 + taxon ids in file order."""

    codes: np.ndarray  # (n_seqs, seq_len) int8
    ids: List[str]

    @property
    def n_seqs(self) -> int:
        return self.codes.shape[0]

    @property
    def seq_len(self) -> int:
        return self.codes.shape[1]

    def one_hot_ref_layout(self, dtype=np.float32) -> np.ndarray:
        """Return the reference's ``(22, L, n)`` one-hot layout."""
        # codes (n, L) -> one-hot (n, L, 22) -> transpose to (22, L, n),
        # matching torch ``one_hot(...).permute(2, 1, 0)``.
        return one_hot(self.codes, dtype=dtype).transpose(2, 1, 0)


def read_fasta(path_or_bytes: Union[str, os.PathLike, bytes], strict: bool = True) -> Alignment:
    """Parse a FASTA alignment into an :class:`Alignment`.

    All sequences must have equal length (it is an MSA).
    """
    if isinstance(path_or_bytes, bytes):
        raw = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as fh:
            raw = fh.read()

    ids: List[str] = []
    chunks: List[List[bytes]] = []
    for line in raw.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(b">"):
            ids.append(line[1:].decode("utf8"))
            chunks.append([])
        else:
            if not chunks:
                raise ValueError("FASTA sequence data before first '>' header")
            chunks[-1].append(line)

    if not ids:
        raise ValueError("empty FASTA file")

    seqs = [encode_bytes(b"".join(c), strict=strict) for c in chunks]
    lengths = {len(s) for s in seqs}
    if len(lengths) != 1:
        raise ValueError(f"unaligned FASTA: sequence lengths differ ({sorted(lengths)})")

    return Alignment(codes=np.stack(seqs).astype(np.int8), ids=ids)


def load_alignment(path: Union[str, os.PathLike]) -> Tuple[np.ndarray, List[str]]:
    """Reference-compatible loader: one-hot ``(22, L, n)`` float32 + ids.

    Mirrors `/root/reference/phyloformer/data.py:11-31` (but torch-free).
    """
    aln = read_fasta(path, strict=True)
    return aln.one_hot_ref_layout(), aln.ids


def write_fasta(path: Union[str, os.PathLike], aln: Alignment, width: int = 0) -> None:
    """Write an alignment back to FASTA (width=0 means one line per sequence)."""
    buf = io.StringIO()
    for taxon, row in zip(aln.ids, aln.codes):
        buf.write(f">{taxon}\n")
        seq = decode_codes(row).decode("ascii")
        if width and width > 0:
            for start in range(0, len(seq), width):
                buf.write(seq[start : start + width] + "\n")
        else:
            buf.write(seq + "\n")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())


def has_fasta_ext(path: Union[str, os.PathLike]) -> bool:
    """Reference extension filter (`/root/reference/infer_alns.py:36-38`)."""
    p = str(path).lower()
    return p.endswith(".fa") or p.endswith(".fasta")
