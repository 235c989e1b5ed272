"""Device meshes and sharding policy.

The reference's only distribution strategy is DDP data parallelism over
SLURM-launched GPU processes with NCCL collectives
(`/root/reference/train_distributed.py:413-420`).  The TPU-native design:

- a 2-D logical mesh ``('data', 'pair')``: batch data parallelism plus
  optional sharding of the quadratic pair axis (P = n(n-1)/2).  Linear
  attention's attended-axis state is a pure sum (Σk, ΣkᵀV), so pair-axis
  sharding reduces exactly via XLA-inserted collectives — the TPU analogue
  of sequence/context parallelism, riding ICI instead of NCCL;
- parameters are replicated (308k params — TP would be overhead);
- gradients are reduced by XLA (psum over 'data') via sharded-batch jit;
- multi-host: `jax.distributed.initialize` + the same mesh spanning hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PAIR_AXIS = "pair"


def make_mesh(
    data: Optional[int] = None,
    pair: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``('data', 'pair')`` mesh over the available devices.

    ``data=None`` uses all remaining devices for data parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % pair != 0:
            raise ValueError(f"{n} devices not divisible by pair={pair}")
        data = n // pair
    if data * pair != n:
        raise ValueError(f"mesh {data}x{pair} != {n} devices")
    arr = np.array(devices).reshape(data, pair)
    return Mesh(arr, (DATA_AXIS, PAIR_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def activation_pair_sharding(mesh: Mesh) -> NamedSharding:
    """(B, P, L, d) activations: batch over 'data', pair axis over 'pair'."""
    return NamedSharding(mesh, P(DATA_AXIS, PAIR_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def host_local_slice(global_count: int) -> Tuple[int, int]:
    """[start, stop) of this host's shard of a global work list (inference
    file sharding across hosts; merged later via all-gather or host gather)."""
    pid, nproc = jax.process_index(), jax.process_count()
    per = -(-global_count // nproc)
    start = min(pid * per, global_count)
    return start, min(start + per, global_count)
