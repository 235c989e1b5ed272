"""Pair-index utilities.

The reference materializes a ``(n*(n-1)/2, n)`` 0/1 "seq2pair" matrix and
multiplies it with the embedded alignment (`/root/reference/phyloformer/model.py:8-39,175`).
Row ``k`` of that matrix has ones at columns ``(i, j)``, enumerated as
``for i in range(n): for j in range(i+1, n)`` — i.e. upper-triangle order.

On TPU we never build that matrix: the same contraction is a gather-add
``pair[k] = seq[i_k] + seq[j_k]`` (exact same arithmetic, fewer FLOPs and no
(P, n) buffer).  These helpers produce the index vectors and the inverse
scatter used to assemble square distance matrices.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np


def n_pairs(n_seqs: int) -> int:
    return n_seqs * (n_seqs - 1) // 2


@lru_cache(maxsize=None)
def pair_indices(n_seqs: int) -> Tuple[np.ndarray, np.ndarray]:
    """``(i_idx, j_idx)`` int32 arrays of length ``C(n,2)`` in upper-triangle
    enumeration order (matches ``seq2pair`` row order and
    ``itertools.combinations(range(n), 2)``)."""
    i_idx, j_idx = np.triu_indices(n_seqs, k=1)
    return i_idx.astype(np.int32), j_idx.astype(np.int32)


def seq2pair_matrix(n_seqs: int, dtype=np.float32) -> np.ndarray:
    """Densified ``(P, n)`` 0/1 matrix (only used by tests to prove
    equivalence with the gather-add path)."""
    i_idx, j_idx = pair_indices(n_seqs)
    mat = np.zeros((len(i_idx), n_seqs), dtype=dtype)
    rows = np.arange(len(i_idx))
    mat[rows, i_idx] = 1
    mat[rows, j_idx] = 1
    return mat


def vector_to_square(vec: np.ndarray, n_seqs: int) -> np.ndarray:
    """Scatter an upper-triangle vector into a symmetric ``(n, n)`` matrix
    with a zero diagonal (reference `vec_to_phylip`,
    `/root/reference/infer_alns.py:14-25`)."""
    vec = np.asarray(vec)
    if vec.shape[-1] != n_pairs(n_seqs):
        raise ValueError(
            f"expected {n_pairs(n_seqs)} pair distances for n={n_seqs}, got {vec.shape[-1]}"
        )
    i_idx, j_idx = pair_indices(n_seqs)
    square = np.zeros(vec.shape[:-1] + (n_seqs, n_seqs), dtype=vec.dtype)
    square[..., i_idx, j_idx] = vec
    square[..., j_idx, i_idx] = vec
    return square


def square_to_vector(mat: np.ndarray) -> np.ndarray:
    """Inverse of :func:`vector_to_square` (reads the upper triangle)."""
    n = mat.shape[-1]
    i_idx, j_idx = pair_indices(n)
    return mat[..., i_idx, j_idx]
