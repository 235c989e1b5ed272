"""Measure the training step on the dev chip: XLA path vs fused Pallas path.

Usage: python tools/bench_train_step.py [xla|fused|remat ...]

Shape: batch 4 (the reference default), 50 tips x 256 sites — the headline
training shape from docs/performance.md.  Timing is hard-synced by a D2H
materialization of the loss (block_until_ready does not synchronize through
the axon relay).
"""

import os
import sys
import time

import numpy as np

modes = sys.argv[1:] or ["xla", "fused"]

import jax  # noqa: E402

from phyloformer_tpu.data.pairs import n_pairs  # noqa: E402
from phyloformer_tpu.models import PhyloformerConfig  # noqa: E402
from phyloformer_tpu.train import TrainConfig, create_train_state, make_train_step  # noqa: E402

B, N, L = int(os.environ.get("PF_BENCH_B", "4")), 50, 256
cfg = PhyloformerConfig(matmul_precision="default")
rng = np.random.default_rng(0)
batch = {
    "codes": rng.integers(0, 22, (B, N, L)).astype(np.int32),
    "dists": rng.uniform(0.05, 1.0, (B, n_pairs(N))).astype(np.float32),
    "site_mask": np.asarray([[True] * 250 + [False] * 6] * B),
    "seq_mask": np.ones((B, N), bool),
}
batch = {k: jax.device_put(v) for k, v in batch.items()}

print(f"devices={jax.devices()}", flush=True)

results = {}
for mode in modes:
    if mode == "remat":
        os.environ["PF_PALLAS_BWD"] = "remat"
    else:
        os.environ.pop("PF_PALLAS_BWD", None)
    tcfg = TrainConfig(total_steps=100, warmup_steps=10,
                       use_pallas=(mode != "xla"))
    state, tx = create_train_state(cfg, tcfg)
    step = make_train_step(cfg, tcfg, tx)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, logs = step(state, batch, key)
    loss0 = float(np.asarray(logs["train_loss"]))  # sync
    compile_s = time.perf_counter() - t0
    print(f"[{mode}] compile+first step: {compile_s:.1f}s loss={loss0:.4f}",
          flush=True)

    # warmup one more, then timed steps (sync each: per-step dispatch cost
    # is part of the real training loop too)
    state, logs = step(state, batch, key)
    _ = float(np.asarray(logs["train_loss"]))
    times = []
    for i in range(10):
        t0 = time.perf_counter()
        state, logs = step(state, batch, key)
        _ = float(np.asarray(logs["train_loss"]))
        times.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(times))
    results[mode] = (ms, float(np.asarray(logs["train_loss"])))
    print(f"[{mode}] step: {ms:.1f} ms (median of 10), "
          f"min {1000*min(times):.1f} max {1000*max(times):.1f}, "
          f"loss={results[mode][1]:.6f}", flush=True)

print("\nsummary:")
for mode, (ms, loss) in results.items():
    print(f"  {mode:6s} {ms:8.1f} ms/step  loss={loss:.6f}")
