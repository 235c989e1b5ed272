"""Batched, bucketed TPU inference engine.

Fixes the reference's two structural throughput limits
(`/root/reference/infer_alns.py:95-112`): serial batch=1 execution and a
recompile (torch reshape) for every new alignment shape.  Here alignments are
padded into a small set of (n, L) buckets (masked so padding is an exact
no-op — see :mod:`phyloformer_tpu.ops.attention`), batched under a token
budget, and run through one jitted forward per bucket shape.
"""

from __future__ import annotations

import dataclasses
import time
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..data.fasta import Alignment
from ..data.pairs import n_pairs, pair_indices
from ..models.params import Params, PhyloformerConfig
from ..models.phyloformer import forward

DEFAULT_N_BUCKETS = (10, 20, 30, 40, 50, 60, 80, 100, 120, 150, 200)
# Beyond 2048 sites the fused path switches to the two-pass L-tiled kernels
# (no site cap); alignments longer than the last bucket still work via the
# allow_oversize exact-shape fallback.
DEFAULT_L_BUCKETS = (128, 256, 384, 512, 640, 768, 1024, 1280, 1536, 2048,
                     3072, 4096)


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    n_buckets: Tuple[int, ...] = DEFAULT_N_BUCKETS
    l_buckets: Tuple[int, ...] = DEFAULT_L_BUCKETS
    # Max activation tokens (B * P * L) per device batch; bounds HBM use.
    # 2^22 tokens * 64 ch * 4 B = 1 GiB per fp32 activation tensor; XLA keeps
    # a handful of live copies per block (residual + attention branch +
    # transpose), so this keeps peak HBM well under 16 GB.
    max_batch_tokens: int = 1 << 22
    max_batch_size: int = 64
    precision: str = "float32"  # "float32" | "bfloat16" parameter/activation dtype
    # Matmul pass mode: "float32" = full fp32 (parity), "tensorfloat32" =
    # 3-pass bf16 MXU, "default" = single-pass bf16 MXU (fastest; final
    # distance error ~1e-3 relative, see bench.py accuracy gate).
    matmul_precision: str = "float32"
    use_pallas: bool = False  # fused Pallas axial-block kernels (TPU)
    # Pipelined fused kernels (merged block boundaries + in-kernel pair
    # gather and head — ops/pallas/pipeline.py).  None = auto: on whenever
    # use_pallas is set and the bucket's site axis is VMEM-resident.
    use_pipeline: Optional[bool] = None
    # Storage dtype of inter-kernel activations on the pipelined path
    # ("float32" | "bfloat16").  Compute stays fp32 in-register; bfloat16
    # halves HBM traffic/residency (what makes (200, 1000) single-chip).
    pipeline_act_dtype: str = "float32"
    # FFN GELU variant on the pipelined path ("exact" | "tanh" | "sigmoid").
    # "exact" matches the reference's erf GELU; "tanh" cuts the dominant VPU
    # term of the merged kernels (~+17% headline throughput, round-5 probe)
    # and is gated end-to-end by bench.py's end-metric-calibrated gate.
    pipeline_gelu: str = "exact"
    allow_oversize: bool = True  # n/L beyond last bucket: exact-shape fallback
    # Round device batch sizes up to powers of two (padding rows are fully
    # masked no-ops).  Bounds jit retraces to log2(max_batch_size) per bucket
    # shape — essential for serving, where request bursts otherwise produce a
    # fresh compile per distinct batch size.
    pad_batch_sizes: bool = False


def _bucketize(value: int, buckets: Sequence[int], allow_oversize: bool) -> int:
    for b in buckets:
        if value <= b:
            return b
    if allow_oversize:
        return value
    raise ValueError(f"value {value} exceeds largest bucket {buckets[-1]}")


@lru_cache(maxsize=None)
def real_pair_selector(pad_n: int, n: int) -> np.ndarray:
    """Indices into the padded pair axis that correspond to real pairs,
    in the real upper-triangle order."""
    i_idx, j_idx = pair_indices(pad_n)
    return np.nonzero((i_idx < n) & (j_idx < n))[0]


class InferenceEngine:
    """Runs Phyloformer forward passes over many alignments efficiently."""

    def __init__(
        self,
        params: Params,
        cfg: PhyloformerConfig,
        icfg: Optional[InferenceConfig] = None,
    ):
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        self.icfg = icfg or InferenceConfig()
        if self.icfg.matmul_precision != cfg.matmul_precision:
            cfg = dataclasses.replace(cfg, matmul_precision=self.icfg.matmul_precision)
        self.cfg = cfg
        if self.icfg.precision == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else x,
                params,
            )
        self.params = jax.device_put(params)
        self._compiled: Dict[Tuple[int, int], object] = {}
        self.stats = {"compile_s": 0.0, "device_s": 0.0, "batches": 0, "alignments": 0}

    # -- compilation ---------------------------------------------------------
    def _fn_for(self, pad_n: int, pad_l: int):
        key = (pad_n, pad_l)
        fn = self._compiled.get(key)
        if fn is None:
            jax, cfg = self._jax, self.cfg
            use_pallas = self.icfg.use_pallas
            # off-TPU the fused kernels only exist in interpret mode (the
            # sharded engine path does the same) — lets the accuracy-grid
            # command and CPU CI drive the exact fused code path
            interpret = jax.default_backend() != "tpu"

            mxu = "highest" if cfg.matmul_precision == "float32" else "default"
            pipeline = self.icfg.use_pipeline
            if pipeline is None:
                from ..ops.pallas.pipeline import pipeline_supported

                pipeline = use_pallas and pipeline_supported(pad_n, pad_l, mxu)

            def run(params, codes, site_mask, seq_mask):
                if use_pallas and pipeline:
                    from ..ops.pallas.pipeline import forward_fused_pipeline

                    out = forward_fused_pipeline(
                        params, codes, pad_n, site_mask, seq_mask,
                        n_heads=cfg.n_heads, eps=cfg.ln_eps,
                        interpret=interpret, mxu_precision=mxu,
                        act_dtype_name=self.icfg.pipeline_act_dtype,
                        gelu_mode=self.icfg.pipeline_gelu,
                    )
                elif use_pallas:
                    from ..models.phyloformer import forward_fused

                    out = forward_fused(
                        params, codes, cfg, site_mask=site_mask,
                        seq_mask=seq_mask, interpret=interpret,
                    )
                else:
                    out = forward(
                        params, codes, cfg, site_mask=site_mask, seq_mask=seq_mask
                    )
                return out.astype(self._jnp.float32)

            fn = jax.jit(run)
            self._compiled[key] = fn
        return fn

    # -- batching ------------------------------------------------------------
    def _plan(self, alns: Sequence[Alignment]):
        """Group alignment indices into (pad_n, pad_l) buckets, then chunk into
        batches respecting the token budget."""
        groups: Dict[Tuple[int, int], List[int]] = {}
        for idx, a in enumerate(alns):
            pad_n = _bucketize(a.n_seqs, self.icfg.n_buckets, self.icfg.allow_oversize)
            pad_l = _bucketize(a.seq_len, self.icfg.l_buckets, self.icfg.allow_oversize)
            groups.setdefault((pad_n, pad_l), []).append(idx)

        batches = []
        for (pad_n, pad_l), idxs in sorted(groups.items()):
            tokens_per = n_pairs(pad_n) * pad_l
            bsz = max(1, min(self.icfg.max_batch_size, self.icfg.max_batch_tokens // max(tokens_per, 1)))
            if self.icfg.pad_batch_sizes and bsz > 1:
                # round DOWN to a power of two so that predict()'s pad-up of
                # partial chunks never exceeds the token/size budgets
                bsz = 1 << (bsz.bit_length() - 1)
            for start in range(0, len(idxs), bsz):
                batches.append(((pad_n, pad_l), idxs[start : start + bsz]))
        return batches

    def _stage(self, codes, site_mask, seq_mask):
        """Move one assembled batch to the device(s).  Overridden by the
        sharded engine to place inputs with the mesh batch sharding."""
        put = self._jax.device_put
        return put(codes), put(site_mask), put(seq_mask)

    def _padded_bsz(self, n: int) -> int:
        """Device batch size for ``n`` planned rows under pad_batch_sizes.
        The sharded engine overrides this to keep the result divisible by
        the mesh 'data' axis."""
        return 1 << (n - 1).bit_length()

    # Cap on staged (pre-transferred) input bytes per window.  Inputs are
    # tiny next to activations (int32 codes: B*n*L*4), so one window covers
    # any realistic workload; the cap only guards pathological plans.
    _STAGE_WINDOW_BYTES = 256 << 20

    def predict(self, alns: Sequence[Alignment]) -> List[np.ndarray]:
        """Predict distance vectors for every alignment.

        Returns one float32 array of shape ``(C(n_i, 2),)`` per input, in
        input order.  Execution is phased per window: (1) assemble and
        transfer every batch's inputs, (2) dispatch all device computations,
        (3) collect results.  Interleaving transfers with dispatch serializes
        on high-latency device links (measured ~2.9 s extra on the 256-MSA
        headline bench through the axon relay, 24 -> 33 aln/s device-side);
        staging all H2D traffic ahead of the compute queue avoids that.
        """
        out: List[Optional[np.ndarray]] = [None] * len(alns)
        t0 = time.perf_counter()
        plan = self._plan(alns)
        cursor = 0
        while cursor < len(plan):
            # -- phase 1: assemble + transfer a window of batches ----------
            staged = []  # (shape, idxs, device inputs)
            window_bytes = 0
            while cursor < len(plan):
                (pad_n, pad_l), idxs = plan[cursor]
                bsz = len(idxs)
                if self.icfg.pad_batch_sizes:
                    bsz = self._padded_bsz(bsz)
                codes = np.zeros((bsz, pad_n, pad_l), dtype=np.int32)
                site_mask = np.zeros((bsz, pad_l), dtype=bool)
                seq_mask = np.zeros((bsz, pad_n), dtype=bool)
                for row, idx in enumerate(idxs):
                    a = alns[idx]
                    codes[row, : a.n_seqs, : a.seq_len] = a.codes
                    site_mask[row, : a.seq_len] = True
                    seq_mask[row, : a.n_seqs] = True
                staged.append(
                    ((pad_n, pad_l), idxs, self._stage(codes, site_mask, seq_mask))
                )
                window_bytes += codes.nbytes + site_mask.nbytes + seq_mask.nbytes
                cursor += 1
                if window_bytes >= self._STAGE_WINDOW_BYTES:
                    break

            # -- phase 2: dispatch (async) ---------------------------------
            pending = []
            for (pad_n, pad_l), idxs, (codes, site_mask, seq_mask) in staged:
                fn = self._fn_for(pad_n, pad_l)
                preds = fn(self.params, codes, site_mask, seq_mask)
                pending.append(((pad_n, pad_l), idxs, preds))
                self.stats["batches"] += 1
                # real alignments: not batch-size padding, not the sharded
                # engine's repeat-padding of the index list
                self.stats["alignments"] += len(set(idxs))

            # -- phase 3: collect ------------------------------------------
            for (pad_n, _pad_l), idxs, preds in pending:
                preds = np.asarray(preds)  # sync + D2H
                for row, idx in enumerate(idxs):
                    n = alns[idx].n_seqs
                    sel = real_pair_selector(pad_n, n)
                    out[idx] = preds[row, sel].astype(np.float32)
        self.stats["device_s"] += time.perf_counter() - t0
        return out  # type: ignore[return-value]

    def predict_one(self, aln: Alignment) -> np.ndarray:
        return self.predict([aln])[0]


class ShardedInferenceEngine(InferenceEngine):
    """Multi-chip inference: batch over the mesh 'data' axis and — for
    alignments whose quadratic pair axis outgrows one chip's HBM — the
    activation pair axis over the 'pair' axis (linear attention's pair-axis
    state reduces exactly via the XLA-inserted psum; see
    ``parallel/mesh.py``).  Multi-host: combine with per-host file sharding
    (:func:`phyloformer_tpu.parallel.host_local_slice`)."""

    def __init__(self, params, cfg, mesh, icfg: Optional[InferenceConfig] = None):
        super().__init__(params, cfg, icfg)
        import jax

        from ..parallel.mesh import activation_pair_sharding, replicated

        self.mesh = mesh
        self._act_sharding = activation_pair_sharding(mesh)
        self.params = jax.device_put(self.params, replicated(mesh))

    def _stage(self, codes, site_mask, seq_mask):
        from ..parallel.mesh import batch_sharding

        put, bsh = self._jax.device_put, batch_sharding(self.mesh)
        return put(codes, bsh), put(site_mask, bsh), put(seq_mask, bsh)

    def _fn_for(self, pad_n: int, pad_l: int):
        key = (pad_n, pad_l)
        fn = self._compiled.get(key)
        if fn is None:
            jax, cfg = self._jax, self.cfg
            act_sharding = self._act_sharding
            mesh = self.mesh

            if self.icfg.use_pallas and mesh.shape.get("pair", 1) > 1:
                # fused kernels under shard_map: each device runs kernel A
                # on its pair shard, psums the linear-attention stats (the
                # only collective), runs kernel B locally
                from ..data.pairs import n_pairs as _n_pairs
                from ..ops.pallas.sharded import forward_fused_sharded

                p_real = _n_pairs(pad_n)
                interpret = jax.default_backend() != "tpu"

                def run(params, codes, site_mask, seq_mask):
                    out = forward_fused_sharded(
                        params, codes, cfg, mesh,
                        site_mask=site_mask, seq_mask=seq_mask,
                        interpret=interpret,
                    )
                    return out[:, :p_real].astype(self._jnp.float32)
            else:
                def run(params, codes, site_mask, seq_mask):
                    out = forward(
                        params, codes, cfg, site_mask=site_mask,
                        seq_mask=seq_mask, act_sharding=act_sharding,
                    )
                    return out.astype(self._jnp.float32)

            from ..parallel.mesh import batch_sharding, replicated

            bsh, rep = batch_sharding(self.mesh), replicated(self.mesh)
            fn = jax.jit(
                run,
                in_shardings=(rep, bsh, bsh, bsh),
                out_shardings=rep,
            )
            self._compiled[key] = fn
        return fn

    def _plan(self, alns):
        """Plan batches whose sizes are divisible by the mesh 'data' axis.

        Each batch's index list is rounded up to a multiple of the data-axis
        size by repeating its last alignment index.  The duplicates are real
        (cheap) forward passes; ``predict`` writes results by index, so the
        repeated entries simply overwrite the same output slot and nothing
        needs masking on return."""
        batches = super()._plan(alns)
        ndata = self.mesh.shape["data"]
        fixed = []
        for (shape, idxs) in batches:
            # round the index list up to a multiple of ndata by repeats;
            # predict() overwrites by idx so repeated entries are harmless
            while len(idxs) % ndata:
                idxs = idxs + [idxs[-1]]
            fixed.append((shape, idxs))
        return fixed

    def _padded_bsz(self, n: int) -> int:
        """Power-of-two padding, then rounded up to a multiple of the mesh
        'data' axis so the batch-axis sharding stays divisible (a non-power-
        of-two data axis would otherwise break device_put)."""
        b = super()._padded_bsz(n)
        ndata = self.mesh.shape["data"]
        return -(-b // ndata) * ndata
