"""On-chip gradient parity: fused Pallas backward vs XLA autodiff.

Same batch/params as tools/bench_train_step.py (shares the kernel compile
cache); reports max relative error per parameter group.
"""

import numpy as np

import jax

from phyloformer_tpu.data.pairs import n_pairs
from phyloformer_tpu.models import PhyloformerConfig
from phyloformer_tpu.models.params import init_params
from phyloformer_tpu.train import TrainConfig
from phyloformer_tpu.train.trainer import _batch_loss
from phyloformer_tpu.train.losses import get_loss

B, N, L = 4, 50, 256
import sys
cfg = PhyloformerConfig(matmul_precision=sys.argv[1] if len(sys.argv) > 1 else "default")
rng = np.random.default_rng(0)
batch = {
    "codes": rng.integers(0, 22, (B, N, L)).astype(np.int32),
    "dists": rng.uniform(0.05, 1.0, (B, n_pairs(N))).astype(np.float32),
    "site_mask": np.asarray([[True] * 250 + [False] * 6] * B),
    "seq_mask": np.ones((B, N), bool),
}
batch = {k: jax.device_put(v) for k, v in batch.items()}
params = init_params(jax.random.PRNGKey(3), cfg)
loss_fn = get_loss("mae")

grads = {}
for mode in ("fused", "xla"):
    tcfg = TrainConfig(use_pallas=(mode == "fused"))

    def f(p):
        return _batch_loss(p, batch, cfg, tcfg, loss_fn, None, None)[0]

    val, g = jax.jit(jax.value_and_grad(f))(params)
    grads[mode] = jax.tree_util.tree_map(np.asarray, g)
    print(f"[{mode}] loss={float(np.asarray(val)):.6f}", flush=True)

worst = 0.0
for (p1, a), (_, b) in zip(
    jax.tree_util.tree_leaves_with_path(grads["fused"]),
    jax.tree_util.tree_leaves_with_path(grads["xla"]),
):
    scale = max(np.abs(b).max(), 1e-8)
    rel = np.abs(a - b).max() / scale
    worst = max(worst, rel)
    flag = "  <-- CHECK" if rel > 5e-3 else ""
    print(f"{jax.tree_util.keystr(p1):55s} rel={rel:.2e}{flag}")
print(f"\nworst relative error: {worst:.2e}")
