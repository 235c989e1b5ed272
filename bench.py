"""Headline benchmark: inference throughput (alignments/sec/chip) at 60-tip MSAs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the fast path (bf16 MXU matmuls) but only after an accuracy gate:
its distance predictions must stay within 2e-3 max-abs of the fp32-parity
path on real testdata; otherwise the fp32 number is reported instead.

Baseline denominator: the reference PyTorch pipeline (infer_alns.py) is
serial batch=1; measured here at 20 tips x 250 AA it runs ~0.34 aln/s on CPU
(~2.9 s/MSA, BASELINE.md).  Scaling its per-token cost to 60 tips (P=1770 vs
190 pairs) and granting a ~25x GPU speedup over this CPU gives ~3.0 aln/s for
the reference GPU path at 60 tips — the documented estimate used as the
vs_baseline denominator (the repo publishes no absolute GPU throughput).
"""

import json
import sys
import time

import numpy as np

BASELINE_ALN_PER_S = 3.0  # estimated reference GPU path @ 60-tip MSAs (see above)

N_TIPS = 60
SEQ_LEN = 250
N_ALIGNMENTS = 256
ACCURACY_GATE = 2e-3


def make_synthetic_alignments(n_alignments, n_tips, seq_len, seed=0):
    from phyloformer_tpu.data.fasta import Alignment

    rng = np.random.default_rng(seed)
    alns = []
    for i in range(n_alignments):
        codes = rng.integers(0, 20, size=(n_tips, seq_len)).astype(np.int8)
        alns.append(Alignment(codes=codes, ids=[f"T{j}" for j in range(n_tips)]))
    return alns


def throughput(engine, alns):
    engine.predict(alns[:8])  # warmup/compile
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
    use_pallas = os.environ.get("PF_BENCH_PALLAS", "0") == "1"
    slow_engine = InferenceEngine(params, cfg, InferenceConfig(matmul_precision="float32"))
    fast_engine = InferenceEngine(
        params,
        cfg,
        InferenceConfig(
            matmul_precision="tensorfloat32",
            max_batch_tokens=1 << 23,
            use_pallas=use_pallas,
        ),
    )
    ref_preds = slow_engine.predict(real)
    fast_preds = fast_engine.predict(real)
    acc_err = max(np.abs(a - b).max() for a, b in zip(ref_preds, fast_preds))
    use_fast = acc_err <= ACCURACY_GATE
    print(f"# fast-path accuracy err={acc_err:.2e} gate={ACCURACY_GATE} "
          f"use_fast={use_fast} pallas={use_pallas}", file=sys.stderr)

    engine = fast_engine if use_fast else slow_engine
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
    main()
