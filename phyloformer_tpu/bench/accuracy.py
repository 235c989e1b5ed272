"""Fused-path accuracy drift by (n, L), as a first-class bench command.

The headline bench gate (6e-3 absolute vs fp32 goldens, ``bench.py``) is
calibrated at the testdata shapes; the envelope it depends on — fused-kernel
drift of ~0.3-0.6% *relative* across the reference benchmark-grid corners
(`/root/reference/make_plots.py:98,230` grid, tips up to the 200 cap) — was
measured by a one-off tool in round 2.  ``pf-bench accuracy-grid`` makes the
re-measurement one command so any kernel change re-validates the envelope
(VERDICT r2 item #8).

Oracle policy per corner: the XLA float32 path where its materialized
activations fit in HBM; beyond that the fused HIGHEST-precision path, which
round-2 measured within 5.3e-5 of XLA fp32 (docs/performance.md).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.fasta import Alignment
from ..infer.engine import InferenceConfig, InferenceEngine

# The measurable single-chip corners.  (200, 1000) — HBM-infeasible on
# every round-3 path (~5.2 GB per live fp32 activation tensor) — is BACK
# in the default grid since round 4: the pipelined kernels keep only two
# live inter-kernel tensors and store them bfloat16 (~2.6 GB each), so the
# reference's largest supported shape (`model.py:39`) runs single-chip.
DEFAULT_GRID: Tuple[Tuple[int, int], ...] = (
    (50, 250), (100, 250), (100, 1000), (200, 250), (200, 1000),
)
# pair-tokens ceiling under which the XLA fp32 path fits single-chip HBM
XLA_FP32_MAX_TOKENS = 100 * 99 // 2 * 1024
# beyond this, fp32-storage fused paths exceed HBM: the fast path runs the
# pipeline with bfloat16 storage and the oracle is the sequential
# P-chunked FULL-fp32 forward (infer/oracle.py) — a genuine fp32-grade
# oracle at the (200, 1000) corner, so the bf16 storage-rounding term is
# directly measured there instead of cancelling out (round 5; previously
# both sides ran bf16 storage and only matmul passes differed)
FP32_STORAGE_MAX_TOKENS = 200 * 199 // 2 * 256


def _bucket(n: int, l: int) -> Dict:
    # real envelope corners land on the calibrated 256/1024 rungs; the small
    # rungs keep CPU-interpret test corners cheap
    if l <= 32:
        lb = 32
    elif l <= 64:
        lb = 64
    else:
        lb = 256 if l <= 250 else 1024
    return dict(n_buckets=(n,), l_buckets=(lb,))


def make_engines(params, cfg, n: int, l: int):
    """(fast fused engine, oracle engine, oracle name) for one grid corner.

    On non-TPU backends the engine runs the fused kernels in Pallas
    interpret mode automatically, so the same command exercises the code
    path (not the envelope) in CPU CI.
    """
    buckets = _bucket(n, l)
    # oracle-selection threshold uses the SAME l-bucket the engines run
    # (small custom corners land on the 32/64 rungs, not 256)
    pairs_tokens = n * (n - 1) // 2 * buckets["l_buckets"][0]
    act = "bfloat16" if pairs_tokens > FP32_STORAGE_MAX_TOKENS else "float32"
    fast = InferenceEngine(params, cfg, InferenceConfig(
        matmul_precision="tensorfloat32", use_pallas=True,
        pipeline_act_dtype=act, max_batch_tokens=1 << 23, **buckets))
    if pairs_tokens <= XLA_FP32_MAX_TOKENS:
        oracle = InferenceEngine(params, cfg, InferenceConfig(
            matmul_precision="float32", max_batch_tokens=1 << 23,
            **buckets))
        name = "xla_fp32"
    elif act == "float32":
        oracle = InferenceEngine(params, cfg, InferenceConfig(
            matmul_precision="float32", use_pallas=True,
            pipeline_act_dtype=act, max_batch_tokens=1 << 23, **buckets))
        name = "fused_highest"
    else:
        # bf16-storage corner: oracle = sequential P-chunked full-fp32
        # forward on the raw (unpadded) alignments
        from ..infer.oracle import predict_fp32_chunked

        def oracle_predict(alns):
            return [predict_fp32_chunked(params, a.codes, n_heads=cfg.n_heads,
                                         eps=cfg.ln_eps) for a in alns]

        oracle = oracle_predict
        name = "fp32_chunked"
    return fast, oracle, name


def drift_grid(
    weights: str,
    grid: Sequence[Tuple[int, int]] = DEFAULT_GRID,
    reps: int = 2,
    seed: int = 0,
) -> List[Dict]:
    """Measure fused-vs-oracle drift at each (n, L); one row per corner."""
    from ..io import load_pretrained

    params, cfg, _ = load_pretrained(weights)
    rng = np.random.default_rng(seed)
    rows: List[Dict] = []
    for n, l in grid:
        alns = [
            Alignment(codes=rng.integers(0, 20, (n, l)).astype(np.int8),
                      ids=[f"T{j}" for j in range(n)])
            for _ in range(reps)
        ]
        fast, oracle, oracle_name = make_engines(params, cfg, n, l)
        try:
            t0 = time.perf_counter()
            got = fast.predict(alns)
            fast_s = time.perf_counter() - t0
            want = (oracle.predict(alns) if hasattr(oracle, "predict")
                    else oracle(alns))
        except Exception as err:  # OOM / compile ceiling at a corner
            rows.append({"n": n, "L": l, "oracle": oracle_name,
                         "error": f"{type(err).__name__}: {err}"[:200]})
            continue
        abs_err = max(float(np.abs(a - b).max()) for a, b in zip(got, want))
        scale = max(float(np.abs(b).max()) for b in want)
        if scale == 0.0:  # degenerate corner (identically-zero oracle output)
            rows.append({"n": n, "L": l, "oracle": oracle_name,
                         "error": "oracle output identically zero"})
            continue
        rows.append({"n": n, "L": l, "oracle": oracle_name,
                     "max_abs_err": abs_err, "rel": abs_err / scale,
                     "fused_s": round(fast_s, 3)})
    return rows


def check_rows(rows: Sequence[Dict], max_rel: float) -> Tuple[bool, str]:
    """(ok, message): every measured corner within the relative envelope."""
    worst: Optional[Dict] = None
    for r in rows:
        if "error" in r:
            return False, f"corner ({r['n']},{r['L']}) failed: {r['error']}"
        if worst is None or r["rel"] > worst["rel"]:
            worst = r
    if worst is None:
        return False, "no corners measured"
    msg = (f"worst rel drift {worst['rel']:.2e} at "
           f"(n={worst['n']}, L={worst['L']}) vs gate {max_rel:g}")
    return worst["rel"] <= max_rel, msg
