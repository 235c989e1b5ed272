"""Measure the reference PyTorch pipeline at the headline bench shape.

Runs the reference model (`/root/reference/phyloformer/model.py`) exactly as
`infer_alns.py` does — serial, batch=1, fp32 — on a 60-tip x 250-AA MSA, and
reports per-alignment latency plus the model's analytic FLOP count.  Used to
derive the defensible GPU-path baseline documented in BASELINE.md (the
reference publishes no absolute GPU throughput).

torch-only process: torch and JAX deadlock when imported together here.
"""

import json
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

from phyloformer.model import Phyloformer

N_TIPS, SEQ_LEN = 60, 250
REPS = 3

torch.manual_seed(0)
model = Phyloformer(n_blocks=6, n_heads=4, h_dim=64, dropout=0.0)
sd = torch.load("/root/reference/models/pf.ckpt", map_location="cpu",
                weights_only=True)["state_dict"]
model.load_state_dict(
    {k[len("model."):]: v for k, v in sd.items() if k != "model.seq2pair"},
    strict=False,
)
model.eval()

rng = np.random.default_rng(0)
onehot = np.zeros((22, SEQ_LEN, N_TIPS), np.float32)
codes = rng.integers(0, 20, size=(N_TIPS, SEQ_LEN))
for i in range(N_TIPS):
    for j in range(SEQ_LEN):
        onehot[codes[i, j], j, i] = 1.0
x = torch.from_numpy(onehot)[None]

with torch.no_grad():
    model(x.float())  # warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        preds = model(x.float())
        times.append(time.perf_counter() - t0)

# Analytic forward FLOPs (dense ops only; matches our cost model in
# docs/performance.md): P = C(n,2) tokens of width L, d=64, 6 blocks.
P = N_TIPS * (N_TIPS - 1) // 2
tokens = P * SEQ_LEN
d, H, f = 64, 4, 256
per_token = (
    2 * d * H * 2      # q,k projections (d->H)
    + 2 * d * d * 2    # v,out projections (row attn)
    + 2 * d * H * 2 + 2 * d * d * 2  # col attn
    + 2 * d * f * 2    # FFN both layers
)
flops = 6 * tokens * per_token + tokens * 2 * 22 * d + tokens * 2 * d  # blocks + embed + head
print(json.dumps({
    "n_tips": N_TIPS,
    "seq_len": SEQ_LEN,
    "pairs": P,
    "median_s_per_aln_cpu": float(np.median(times)),
    "aln_per_s_cpu": 1.0 / float(np.median(times)),
    "forward_tflop_per_aln": flops / 1e12,
    "preds_shape": list(preds.shape),
    "times": times,
}))
