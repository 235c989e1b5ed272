"""Headline benchmark: inference throughput (alignments/sec/chip) at 60-tip MSAs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline denominator: the reference PyTorch pipeline (infer_alns.py) is
serial batch=1; measured here at 20 tips x 250 AA it runs ~0.34 aln/s on CPU
(~2.9 s/MSA, BASELINE.md).  Scaling its per-token cost to 60 tips (P=1770 vs
190) and granting a ~25x GPU speedup over this CPU gives ~3.0 aln/s for the
reference GPU path at 60 tips — the documented estimate used as the
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
WARMUP_BATCHES = 2


def make_synthetic_alignments(n_alignments, n_tips, seq_len, seed=0):
    from phyloformer_tpu.data.fasta import Alignment

    rng = np.random.default_rng(seed)
    alns = []
    for i in range(n_alignments):
        codes = rng.integers(0, 20, size=(n_tips, seq_len)).astype(np.int8)
        alns.append(Alignment(codes=codes, ids=[f"T{j}" for j in range(n_tips)]))
    return alns


def main():
    from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
    from phyloformer_tpu.io import load_pretrained

    import jax

    params, cfg, _ = load_pretrained("/root/reference/models/pf.ckpt")
    engine = InferenceEngine(params, cfg, InferenceConfig())

    alns = make_synthetic_alignments(N_ALIGNMENTS, N_TIPS, SEQ_LEN)

    # Warmup: trigger compilation for the (60, 256) bucket.
    engine.predict(alns[:8])

    t0 = time.perf_counter()
    preds = engine.predict(alns)
    elapsed = time.perf_counter() - t0

    assert len(preds) == N_ALIGNMENTS and preds[0].shape == (N_TIPS * (N_TIPS - 1) // 2,)
    assert all(np.isfinite(p).all() for p in preds)

    aln_per_s = N_ALIGNMENTS / elapsed
    n_chips = max(1, len(jax.devices()))
    value = aln_per_s / n_chips

    print(
        f"# devices={jax.devices()} elapsed={elapsed:.3f}s "
        f"batches={engine.stats['batches']}",
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
