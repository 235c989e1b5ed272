"""Batched on-device MSA simulation (JAX/TPU).

The CPU evolver (:mod:`.msa`) simulates one alignment at a time (~20 aln/s at
50 tips x 250 sites on this host); the reference needs an external IQ-TREE2
binary for the same job (`/root/reference/alisim.py:91-120`).  This module
vectorizes the identical substitution process over a *batch* of trees on the
accelerator:

- transition probabilities from the shared reversible eigensystem
  (``SubstitutionModel.eigensystem``), evaluated per (branch, site-rate) on
  device;
- one ``lax.scan`` down the preorder node list per tree (parent-pointer
  arrays — works for arbitrary topologies, padded to a common node count);
- Gumbel-argmax categorical sampling (no normalization needed: probabilities
  enter only up to scale);
- ``vmap`` over the batch; one jit per (batch, nodes, sites, classes) shape.

Semantics match the CPU evolver: same eigensystem, same gamma-rate
conventions (continuous ``GC`` / discrete ``G<k>``, alpha from the hogenom
prior), same ``-mdef`` frequency-mixture handling (per-site class, shared
exchangeabilities, per-class rate multipliers), same duplicate-rejection
retry loop.  Indels are inherently sequential per-branch edits and stay on
the CPU path — ``pf-simulate-alignments --engine device`` falls back for
``--indels``.

Host-side randomness (alpha/site-rate/class/root-state draws) uses the same
NumPy generator conventions as the CPU path; device-side randomness (the
per-branch substitution draws) uses the JAX PRNG, so the two engines produce
different (but identically distributed) alignments for a given seed.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..data.fasta import Alignment
from ..data.newick import Node
from .models import get_model, load_mdef_nexus
from .msa import MsaSimConfig, _gamma_rate_sampler
from .priors import QuantileSampler


@dataclasses.dataclass
class _PackedTrees:
    """Parent-pointer encoding of a tree batch, padded to a common size."""

    parent: np.ndarray  # (K, N) int32; parent[.,0] = 0 (root self-loop)
    blen: np.ndarray  # (K, N) float32 branch length to parent
    leaf_node: np.ndarray  # (K, n_max) int32 node index of each leaf (pad: 0)
    n_leaves: List[int]
    names: List[List[str]]


def _pack_trees(trees: Sequence[Node], pad_nodes: int = 0) -> _PackedTrees:
    per = []
    for tree in trees:
        # parent indices from the children structure (``.parent`` backlinks
        # can go stale under tree surgery, e.g. the simulator's root pruning)
        order = list(tree.traverse_preorder())
        index = {id(node): i for i, node in enumerate(order)}
        parent = np.zeros(len(order), dtype=np.int32)
        blen = np.zeros(len(order), dtype=np.float32)
        leaf_node, names = [], []
        for i, node in enumerate(order):
            for child in node.children:
                j = index[id(child)]
                parent[j] = i
                blen[j] = float(child.length or 0.0)
            if node.is_leaf:
                leaf_node.append(i)
                names.append(node.name)
        per.append((parent, blen, leaf_node, names))

    n_nodes = max(max(len(p[0]) for p in per), pad_nodes)
    n_max = max(len(p[2]) for p in per)
    K = len(per)
    parent = np.zeros((K, n_nodes), dtype=np.int32)
    blen = np.zeros((K, n_nodes), dtype=np.float32)
    leaf_node = np.zeros((K, n_max), dtype=np.int32)
    for k, (p, b, ln, _) in enumerate(per):
        parent[k, : len(p)] = p
        blen[k, : len(b)] = b
        leaf_node[k, : len(ln)] = ln
    return _PackedTrees(
        parent=parent,
        blen=blen,
        leaf_node=leaf_node,
        n_leaves=[len(p[2]) for p in per],
        names=[p[3] for p in per],
    )


class DeviceSimulator:
    """Reusable batched simulator for one (model, mixture) configuration.

    Holds the eigensystem stacks on device and a jit cache keyed by the
    padded (batch, nodes, sites) shape, so repeated CLI batches at the same
    shape compile once.
    """

    def __init__(self, cfg: MsaSimConfig):
        if cfg.indels:
            raise ValueError("indels are CPU-only; use the 'native' engine")
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        self.cfg = cfg
        model = get_model(cfg.substitution)
        mixture = load_mdef_nexus(cfg.mdef) if cfg.mdef else None
        models = mixture.class_models(model) if mixture else [model]
        eig = [m.eigensystem() for m in models]
        self.lam = jnp.asarray(np.stack([e[0] for e in eig]), jnp.float32)
        self.left = jnp.asarray(np.stack([e[1] for e in eig]), jnp.float32)
        self.right = jnp.asarray(np.stack([e[2] for e in eig]), jnp.float32)
        self.class_weights = (
            np.asarray(mixture.weights) if mixture else np.ones(1)
        )
        self.class_freqs = np.stack([m.freqs for m in models])
        self.class_rate = (
            np.asarray(mixture.class_rates()) if mixture else np.ones(1)
        )
        self._compiled = {}

    # -- device kernel -------------------------------------------------------
    def _fn_for(self, K: int, N: int, L: int):
        key_shape = (K, N, L)
        fn = self._compiled.get(key_shape)
        if fn is not None:
            return fn
        jax, jnp = self._jax, self._jnp
        lam, left, right = self.lam, self.left, self.right

        def one(key, parent, blen, rates, cls, root_states):
            lamc = lam[cls]  # (L, 20)
            leftc = left[cls]  # (L, 20, 20)
            rightc = right[cls]  # (L, 20, 20)

            sites = jnp.arange(L)

            def step(states, i):
                p_state = states[parent[i]]  # (L,)
                e = jnp.exp(lamc * (blen[i] * rates)[:, None])  # (L, 20)
                a = rightc[sites, p_state, :] * e  # (L, 20)
                # unnormalized transition probabilities; Gumbel-argmax samples
                # proportionally, so no renormalization (or clip-side rescale)
                # is needed
                probs = jnp.einsum("lk,lkj->lj", a, leftc)
                logits = jnp.log(jnp.clip(probs, 1e-30, None))
                g = jax.random.gumbel(
                    jax.random.fold_in(key, i), (L, 20), dtype=jnp.float32
                )
                s = jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
                states = states.at[i].set(s)
                return states, None

            init = jnp.zeros((N, L), jnp.int32).at[0].set(root_states)
            states, _ = jax.lax.scan(step, init, jnp.arange(1, N))
            return states

        fn = jax.jit(jax.vmap(one))
        self._compiled[key_shape] = fn
        return fn

    # -- host orchestration ---------------------------------------------------
    def _host_draws(self, K: int, rng: np.random.Generator,
                    alpha_prior: Optional[QuantileSampler]):
        """Per-alignment site rates (incl. class-rate multiplier), classes,
        root states — same conventions as the CPU evolver."""
        L = self.cfg.length
        nclass = len(self.class_weights)
        rates = np.empty((K, L), dtype=np.float32)
        cls = np.empty((K, L), dtype=np.int32)
        roots = np.empty((K, L), dtype=np.int32)
        for k in range(K):
            rate_vec, _ = _gamma_rate_sampler(self.cfg, rng, alpha_prior)
            if nclass == 1:
                c = np.zeros(L, dtype=np.int64)
                roots[k] = rng.choice(20, size=L, p=self.class_freqs[0])
            else:
                c = rng.choice(nclass, size=L, p=self.class_weights)
                r = np.empty(L, dtype=np.int64)
                for ci in range(nclass):
                    m = c == ci
                    if m.any():
                        r[m] = rng.choice(
                            20, size=int(m.sum()), p=self.class_freqs[ci]
                        )
                roots[k] = r
            cls[k] = c
            rates[k] = rate_vec(L) * self.class_rate[c]
        return rates, cls, roots

    def simulate(
        self,
        trees: Sequence[Node],
        rng: np.random.Generator,
        alpha_prior: Optional[QuantileSampler] = None,
        jax_seed: Optional[int] = None,
        pad_nodes: int = 0,
    ) -> List[Alignment]:
        """One simulation attempt per tree (duplicates possible; see
        :func:`simulate_msas_device` for the rejection loop)."""
        jax, jnp = self._jax, self._jnp
        K = len(trees)
        packed = _pack_trees(trees, pad_nodes)
        N, L = packed.parent.shape[1], self.cfg.length
        rates, cls, roots = self._host_draws(K, rng, alpha_prior)

        seed = int(rng.integers(2**63 - 1)) if jax_seed is None else jax_seed
        keys = jax.random.split(jax.random.PRNGKey(seed), K)
        states = self._fn_for(K, N, L)(
            keys,
            jnp.asarray(packed.parent),
            jnp.asarray(packed.blen),
            jnp.asarray(rates),
            jnp.asarray(cls),
            jnp.asarray(roots),
        )
        states = np.asarray(states)  # (K, N, L)

        out = []
        for k in range(K):
            nl = packed.n_leaves[k]
            codes = states[k, packed.leaf_node[k, :nl]].astype(np.int8)
            out.append(Alignment(codes=codes, ids=packed.names[k]))
        return out


def simulate_msas_device(
    trees: Sequence[Node],
    cfg: MsaSimConfig,
    rng: Optional[np.random.Generator] = None,
    alpha_prior: Optional[QuantileSampler] = None,
    batch_size: int = 64,
) -> Tuple[List[Optional[Alignment]], List[int]]:
    """Simulate one alignment per tree with duplicate rejection.

    Returns ``(alignments, attempts)`` in tree order; a ``None`` alignment
    marks a tree whose ``cfg.max_attempts`` simulations all contained
    duplicate sequences (reference retry semantics, ``alisim.py:29-35``).
    Trees run in device batches of a fixed size with a fixed node padding
    (partial/retry batches are padded by repetition), so the whole call —
    retries included — triggers exactly one jit compilation.
    """
    rng = rng if rng is not None else np.random.default_rng()
    sim = DeviceSimulator(cfg)
    results: List[Optional[Alignment]] = [None] * len(trees)
    attempts = [0] * len(trees)
    K = min(batch_size, len(trees))
    pad_nodes = max(
        sum(1 for _ in t.traverse_preorder()) for t in trees
    )

    pending = list(range(len(trees)))
    for _ in range(cfg.max_attempts):
        if not pending:
            break
        fresh: List[int] = []
        for start in range(0, len(pending), K):
            chunk = pending[start : start + K]
            padded = chunk + [chunk[-1]] * (K - len(chunk))
            alns = sim.simulate(
                [trees[i] for i in padded], rng, alpha_prior, pad_nodes=pad_nodes
            )
            for idx, aln in zip(chunk, alns):
                attempts[idx] += 1
                if not cfg.allow_duplicates:
                    rows = {r.tobytes() for r in aln.codes}
                    if len(rows) != aln.n_seqs:
                        fresh.append(idx)
                        continue
                results[idx] = aln
        pending = fresh
    return results, attempts
