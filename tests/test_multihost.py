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
