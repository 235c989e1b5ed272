"""Neighbor-joining tree construction (Saitou & Nei 1987, Studier & Keppler).

Python/NumPy implementation used for the ``--trees`` inference flag — the
reference shells out to scikit-bio's ``nj`` there
(`/root/reference/infer_alns.py:62-63,119-123`).  The production-quality
tree builder (BME + NNI/SPR, FastME-equivalent) lives in ``native/`` with
bindings in :mod:`phyloformer_tpu.trees.native`.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..data.newick import Node


def neighbor_joining(dist: np.ndarray, ids: Sequence[str]) -> Node:
    """Build an unrooted NJ tree from a symmetric distance matrix.

    Returns the root :class:`Node` (trifurcating root, standard NJ shape).
    Negative branch lengths are clamped to 0 (common convention).
    """
    n = len(ids)
    if dist.shape != (n, n):
        raise ValueError(f"distance matrix shape {dist.shape} != ({n},{n})")
    if n < 2:
        raise ValueError("need at least 2 taxa")
    if n == 2:
        root = Node()
        half = float(dist[0, 1]) / 2.0
        root.add_child(Node(ids[0], half))
        root.add_child(Node(ids[1], half))
        return root

    d = dist.astype(np.float64).copy()
    nodes: List[Node] = [Node(name) for name in ids]
    active = list(range(n))

    while len(active) > 2:
        m = len(active)
        sub = d[np.ix_(active, active)]
        totals = sub.sum(axis=1)
        # Q matrix; diagonal excluded via +inf
        q = (m - 2) * sub - totals[:, None] - totals[None, :]
        np.fill_diagonal(q, np.inf)
        a, b = np.unravel_index(np.argmin(q), q.shape)
        if a > b:
            a, b = b, a
        ia, ib = active[a], active[b]

        dij = sub[a, b]
        la = 0.5 * dij + (totals[a] - totals[b]) / (2.0 * (m - 2))
        lb = dij - la
        la, lb = max(la, 0.0), max(lb, 0.0)

        parent = Node()
        na, nb = nodes[ia], nodes[ib]
        na.length, nb.length = float(la), float(lb)
        parent.add_child(na)
        parent.add_child(nb)

        # distances from new node u to every other active k
        du = 0.5 * (d[ia, :] + d[ib, :] - dij)
        iu = ia  # reuse slot ia for the merged node
        d[iu, :] = du
        d[:, iu] = du
        d[iu, iu] = 0.0
        nodes[iu] = parent
        active.remove(active[b])  # remove ib (b > a so indices stay valid)

    # join the last two into a root
    ia, ib = active
    root = Node()
    na, nb = nodes[ia], nodes[ib]
    half = max(float(d[ia, ib]), 0.0)
    if na.children and not nb.children:
        na.add_child(nb)
        nb.length = half
        return na
    if nb.children and not na.children:
        nb.add_child(na)
        na.length = half
        return nb
    na.length = half / 2.0
    nb.length = half / 2.0
    root.add_child(na)
    root.add_child(nb)
    return root
