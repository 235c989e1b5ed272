"""Headline benchmark: inference throughput (alignments/sec/chip) at 60-tip MSAs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the fast path (fused Pallas kernels, tf32/bf16 MXU matmuls) behind
an accuracy gate against the recorded fp32 reference predictions; falls back
to the XLA tf32 path if the gate fails.

Baseline denominator — MEASURED on this same chip, not estimated: the
reference pipeline's exact computational structure (serial batch=1,
materialized seq2pair matmul, channel-first permuted layout, fp32 —
`tools/reference_path_tpu.py`, transcription exact to 3.6e-7 vs the torch
goldens) runs at 7.90 aln/s at the headline shape (60 tips x 250 AA) on
this TPU.  That denominator is GENEROUS to the reference: XLA fuses its
permute-heavy eager graph, so a real torch/CUDA A100 run would be slower
(bandwidth-bound at ~34 GB HBM traffic/alignment — see BASELINE.md for the
published-roofline cross-check, ~40 aln/s upper bound on an A100 vs this
environment's throttled chip).  The reference torch code itself measures
15.06 s/aln on this container's CPU (tools/measure_reference_torch.py).
"""

import json
import sys
import time

import numpy as np

# reference-structure-on-this-chip, measured (tools/reference_path_tpu.py)
BASELINE_ALN_PER_S = 7.90

N_TIPS = 60
SEQ_LEN = 250
N_ALIGNMENTS = 256
# Gate calibrated at the end metric, two ways: (a) the actual fused fast
# path (measured max-abs distance error 2.96e-3 vs the torch fp32 reference)
# run through the FULL pipeline — all 20 testdata MSAs -> pf-fastme
# --nni --spr -> KF — yields mean KF 0.3337, identical to the fp32 path and
# matching the reference's documented 0.333; (b) injecting gaussian distance
# noise at sigma=2.4e-3 moves mean KF only 0.3337 -> 0.3343.  6e-3 (2x the
# measured kernel error) therefore still guards the end metric while leaving
# headroom against run-to-run fp wobble.
ACCURACY_GATE = 6e-3


def make_synthetic_alignments(n_alignments, n_tips, seq_len, seed=0):
    from phyloformer_tpu.data.fasta import Alignment

    rng = np.random.default_rng(seed)
    alns = []
    for i in range(n_alignments):
        codes = rng.integers(0, 20, size=(n_tips, seq_len)).astype(np.int8)
        alns.append(Alignment(codes=codes, ids=[f"T{j}" for j in range(n_tips)]))
    return alns


def throughput(engine, alns):
    # Warm up with one FULL pass: the engine jit-traces per (bucket shape,
    # batch size), so a small warmup batch leaves the steady-state batch
    # sizes (both the full chunks and the final partial chunk) uncompiled —
    # measured at ~2.8 s of first-call retrace inside the timed region.
    engine.predict(alns)
    t0 = time.perf_counter()
    preds = engine.predict(alns)
    elapsed = time.perf_counter() - t0
    assert all(np.isfinite(p).all() for p in preds)
    return len(alns) / elapsed, preds, elapsed


def main():
    import os

    from phyloformer_tpu.data import read_fasta
    from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
    from phyloformer_tpu.io import load_pretrained

    import jax

    params, cfg, _ = load_pretrained("/root/reference/models/pf.ckpt")
    alns = make_synthetic_alignments(N_ALIGNMENTS, N_TIPS, SEQ_LEN)

    # Accuracy gate on real testdata: fast path vs fp32-parity path.
    # Fast path: 3-pass tf32 MXU matmuls (measured max-abs distance error
    # ~3e-5 vs fp32) + larger token budget; PF_BENCH_PALLAS=1 additionally
    # enables the fused Pallas kernels.
    real = [
        read_fasta(f"/root/reference/data/testdata/msas/{n}_40_tips.fa")
        for n in range(3)
    ]
    use_pallas = os.environ.get("PF_BENCH_PALLAS", "1") == "1"
    # Pipelined kernels (merged block boundaries, in-kernel gather + head)
    # are the default fast path; PF_BENCH_PIPELINE=0 restores the per-block
    # kernels, PF_BENCH_ACT_DTYPE=bfloat16 halves inter-kernel HBM traffic.
    use_pipeline = {"1": True, "0": False}.get(
        os.environ.get("PF_BENCH_PIPELINE", ""), None)
    act_dtype = os.environ.get("PF_BENCH_ACT_DTYPE", "float32")
    # FFN activation for the pipelined kernels.  Round-5 probe (same chip,
    # same shape, D2H-synced): exact-erf 215.7 ms/call, tanh 191.3, relu
    # (free-activation floor) 191.9 — the tanh approximation captures the
    # ENTIRE GELU share of the VPU budget while measuring 3.78e-3 vs the
    # torch fp32 goldens, inside the end-metric-calibrated 6e-3 gate below
    # (and KF re-verified 0.3337 on the full testdata pipeline, round 5).
    # PF_BENCH_GELU=exact restores the reference-exact erf path.
    gelu = os.environ.get("PF_BENCH_GELU", "tanh")
    # Single (60, 256) bucket: the 40-tip gate MSAs pad into the same shape
    # the throughput run uses, so the whole bench compiles exactly once.
    fast_engine = InferenceEngine(
        params,
        cfg,
        InferenceConfig(
            matmul_precision="tensorfloat32",
            # 1<<22 tokens -> device batch 9 at the headline shape: the
            # measured round-4 sweet spot for the pipelined kernels (the
            # merged kernel's pair tile halves at batch 18 because XLA pins
            # the whole (B, L, 3d) stats buffers in VMEM scope — B=9/pt=8
            # beats B=18/pt=4 by ~5%; see docs/performance.md round 4)
            max_batch_tokens=int(os.environ.get("PF_BENCH_TOKENS", 1 << 22)),
            use_pallas=use_pallas,
            use_pipeline=use_pipeline,
            pipeline_act_dtype=act_dtype,
            pipeline_gelu=gelu,
            n_buckets=(N_TIPS,),
            l_buckets=(256,),
        ),
    )
    fast_preds = fast_engine.predict(real)

    # Accuracy gate against the recorded reference (PyTorch fp32) predictions
    # (tests/goldens, generated by tools/make_goldens.py) — avoids compiling a
    # second fp32 engine just for the gate.
    goldens = "tests/goldens/pf_preds_testdata.npz"
    if os.path.exists(goldens):
        g = np.load(goldens)
        acc_err = max(
            np.abs(p - g[f"{i}_40_tips"]).max() for i, p in enumerate(fast_preds)
        )
    else:  # fall back to an fp32 engine comparison
        slow_engine = InferenceEngine(
            params, cfg, InferenceConfig(matmul_precision="float32")
        )
        acc_err = max(
            np.abs(a - b).max()
            for a, b in zip(slow_engine.predict(real), fast_preds)
        )
    use_fast = acc_err <= ACCURACY_GATE
    print(f"# fast-path accuracy err={acc_err:.2e} gate={ACCURACY_GATE} "
          f"use_fast={use_fast} pallas={use_pallas}", file=sys.stderr)

    if not use_fast:
        # fall back to the XLA tf32 path (recorded accuracy 3.4e-5)
        engine = InferenceEngine(
            params, cfg,
            InferenceConfig(matmul_precision="tensorfloat32",
                            max_batch_tokens=1 << 23,
                            n_buckets=(N_TIPS,), l_buckets=(256,)),
        )
    else:
        engine = fast_engine
    aln_per_s, preds, elapsed = throughput(engine, alns)
    assert len(preds) == N_ALIGNMENTS and preds[0].shape == (N_TIPS * (N_TIPS - 1) // 2,)

    n_chips = max(1, len(jax.devices()))
    value = aln_per_s / n_chips
    print(
        f"# devices={jax.devices()} elapsed={elapsed:.3f}s batches={engine.stats['batches']}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"alignments/sec/chip (infer, {N_TIPS}-tip x {SEQ_LEN}-AA MSAs)",
                "value": round(value, 3),
                "unit": "alignments/s/chip",
                "vs_baseline": round(value / BASELINE_ALN_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    # The axon remote-compile helper fails transiently (HTTP 500 env races);
    # one retry covers the cases observed in practice.
    try:
        main()
    except Exception as err:  # pragma: no cover
        print(f"# bench attempt 1 failed ({type(err).__name__}: {err}); retrying",
              file=sys.stderr)
        time.sleep(30)
        main()
