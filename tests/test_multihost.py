"""Multi-process (fake multi-host) jax.distributed training test.

Spawns two processes, each with 4 virtual CPU devices, forming a global
8-device 'data' mesh; both must report the identical post-step loss
(gradients reduced across processes via the distributed runtime).
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_two_process_training_step():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_smoke.py"),
             str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=240) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost smoke timed out")

    losses = []
    for i, (out, err) in enumerate(outs):
        assert procs[i].returncode == 0, f"proc {i}: {err[-500:]}"
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["devices"] == 8
        losses.append(rec["loss"])
    assert losses[0] == pytest.approx(losses[1], rel=1e-7)


def test_two_process_pair_sharded_training_step():
    """Pair-axis activation sharding across the process boundary: mesh
    ('data'=1, 'pair'=8) over 2 processes x 4 devices, a 2-block model with
    shard_pairs=True.  Both processes must agree, and the loss must match a
    single-process unsharded run (the cross-host psum is exact)."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_smoke.py"),
             str(i), "2", str(port), "train_pair"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=240) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("pair-sharded multihost smoke timed out")

    losses = []
    for i, (out, err) in enumerate(outs):
        assert procs[i].returncode == 0, f"proc {i}: {err[-500:]}"
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["devices"] == 8
        losses.append(rec["loss"])
    assert losses[0] == pytest.approx(losses[1], rel=1e-7)

    # ground truth: identical seeds/batch, single process, no mesh
    import numpy as np

    from phyloformer_tpu.data.pairs import n_pairs
    from phyloformer_tpu.models import PhyloformerConfig
    from phyloformer_tpu.train import (
        TrainConfig, create_train_state, make_train_step,
    )
    import jax

    cfg = PhyloformerConfig(n_blocks=2, n_heads=2, embed_dim=16)
    tcfg = TrainConfig(total_steps=10, warmup_steps=1)
    state, tx = create_train_state(cfg, tcfg)
    step = make_train_step(cfg, tcfg, tx)
    rng = np.random.default_rng(0)
    B, n, L = 2, 17, 32
    batch = {
        "codes": rng.integers(0, 22, (B, n, L)).astype(np.int32),
        "dists": rng.uniform(0.1, 1.0, (B, n_pairs(n))).astype(np.float32),
        "site_mask": np.ones((B, L), bool),
        "seq_mask": np.ones((B, n), bool),
    }
    _, logs = step(state, batch, jax.random.PRNGKey(0))
    assert losses[0] == pytest.approx(float(logs["train_loss"]), rel=1e-5)


def test_two_process_inference_file_sharding():
    """`pf-infer --multihost` semantics: two jax.distributed processes split
    the alignment list via host_local_slice; the slices must partition the
    list and each shard's predictions must match a single-process run."""
    import numpy as np

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_smoke.py"),
             str(i), "2", str(port), "infer"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=240) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost infer smoke timed out")

    recs = []
    for i, (out, err) in enumerate(outs):
        assert procs[i].returncode == 0, f"proc {i}: {err[-500:]}"
        recs.append(json.loads(out.strip().splitlines()[-1]))
    indices = sorted(i for r in recs for i in r["indices"])
    assert indices == [0, 1, 2, 3, 4]  # a partition: no overlap, no gaps

    # ground truth: same seeds, single process
    import jax

    from phyloformer_tpu.data.fasta import Alignment
    from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
    from phyloformer_tpu.models import PhyloformerConfig
    from phyloformer_tpu.models.params import init_params

    rng = np.random.default_rng(0)
    cfg = PhyloformerConfig(n_blocks=1, n_heads=2, embed_dim=16)
    params = init_params(jax.random.PRNGKey(7), cfg)
    alns = [
        Alignment(codes=rng.integers(0, 20, (6, 32)).astype(np.int8),
                  ids=[f"T{j}" for j in range(6)])
        for _ in range(5)
    ]
    engine = InferenceEngine(params, cfg, InferenceConfig(
        n_buckets=(6,), l_buckets=(32,)))
    expected = [round(float(np.sum(p)), 6) for p in engine.predict(alns)]
    got = {i: c for r in recs for i, c in zip(r["indices"], r["checksums"])}
    for i in range(5):
        assert got[i] == pytest.approx(expected[i], abs=2e-5)
