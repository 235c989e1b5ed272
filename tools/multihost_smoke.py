"""Two-process jax.distributed smoke (multi-host fake on CPU).

Each process owns 4 virtual CPU devices; the global mesh is
('data'=8, 'pair'=1) spanning both processes.

Modes:
- ``train`` (default): every process feeds its local shard of a global
  batch; XLA reduces gradients across processes.  Success criterion: both
  processes finish one step and report the SAME finite loss.
- ``train_pair``: mesh ('data'=1, 'pair'=8) — the activation pair axis is
  sharded across BOTH processes, so the linear-attention pair-axis psum and
  the gradient reductions cross the host boundary.
- ``infer``: the multi-host inference path (`pf-infer --multihost`): each
  process takes its `host_local_slice` of an alignment list, runs the local
  engine, and reports which indices it handled + a prediction checksum.
  The test asserts the slices partition the list and checksums agree with
  a single-process run.

Usage (the test launches both):
    python tools/multihost_smoke.py <process_id> <num_processes> <coord_port> [mode]
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "train"

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phyloformer_tpu.data.pairs import n_pairs  # noqa: E402
from phyloformer_tpu.models import PhyloformerConfig  # noqa: E402
from phyloformer_tpu.parallel import batch_sharding, make_mesh  # noqa: E402
from phyloformer_tpu.train import TrainConfig, create_train_state, make_train_step  # noqa: E402

if mode == "infer":
    from phyloformer_tpu.data.fasta import Alignment
    from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
    from phyloformer_tpu.models import PhyloformerConfig as _Cfg
    from phyloformer_tpu.models.params import init_params
    from phyloformer_tpu.parallel import host_local_slice

    rng = np.random.default_rng(0)  # same stream on every process
    cfg_i = _Cfg(n_blocks=1, n_heads=2, embed_dim=16)
    params = init_params(jax.random.PRNGKey(7), cfg_i)
    alns = [
        Alignment(codes=rng.integers(0, 20, (6, 32)).astype(np.int8),
                  ids=[f"T{j}" for j in range(6)])
        for _ in range(5)
    ]
    start, stop = host_local_slice(len(alns))
    engine = InferenceEngine(params, cfg_i, InferenceConfig(
        n_buckets=(6,), l_buckets=(32,)))
    preds = engine.predict(alns[start:stop])
    print(json.dumps({
        "process": pid,
        "indices": list(range(start, stop)),
        "checksums": [round(float(np.sum(p)), 6) for p in preds],
    }))
    jax.distributed.shutdown()
    sys.exit(0)

assert len(jax.devices()) == 4 * nproc, jax.devices()

if mode == "train_pair":
    # Pair-axis activation sharding ACROSS the process boundary: mesh
    # ('data'=1, 'pair'=8) puts the quadratic pair axis over all devices of
    # both processes, so the linear-attention psum (Σk, Σq, Σk·v over pairs)
    # crosses hosts.  Two blocks so the cross-host reduction feeds a
    # subsequent block's activations, not just the head.
    cfg = PhyloformerConfig(n_blocks=2, n_heads=2, embed_dim=16)
    tcfg = TrainConfig(total_steps=10, warmup_steps=1, shard_pairs=True)
    mesh = make_mesh(data=1, pair=len(jax.devices()))
    B, n, L = 2, 17, 32  # P = C(17,2) = 136 = 8 x 17 pair shards
else:
    cfg = PhyloformerConfig(n_blocks=1, n_heads=2, embed_dim=16)
    tcfg = TrainConfig(total_steps=10, warmup_steps=1)
    mesh = make_mesh(data=len(jax.devices()), pair=1)
    B, n, L = 8, 6, 32

state, tx = create_train_state(cfg, tcfg)
step = make_train_step(cfg, tcfg, tx, mesh=mesh)

# Global batch; every process materializes the full array host-side and
# contributes its local shard (the whole array when data=1: replicated).
rng = np.random.default_rng(0)
global_batch = {
    "codes": rng.integers(0, 22, (B, n, L)).astype(np.int32),
    "dists": rng.uniform(0.1, 1.0, (B, n_pairs(n))).astype(np.float32),
    "site_mask": np.ones((B, L), bool),
    "seq_mask": np.ones((B, n), bool),
}
sharding = batch_sharding(mesh)
ndata = mesh.shape["data"]
if ndata == 1:
    local = global_batch  # batch axis replicated: every process feeds it all
else:
    per = B // nproc
    local = {k: v[pid * per:(pid + 1) * per] for k, v in global_batch.items()}
batch = {
    k: jax.make_array_from_process_local_data(sharding, v)
    for k, v in local.items()
}

state, logs = step(state, batch, jax.random.PRNGKey(0))
loss = float(logs["train_loss"])
print(json.dumps({"process": pid, "loss": loss, "devices": len(jax.devices())}))
jax.distributed.shutdown()
