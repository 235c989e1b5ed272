"""Profiling and debugging utilities.

Replaces the reference's opt-in Lightning ``PyTorchProfiler`` path
(`/root/reference/train_distributed.py:357-359,528-536`: profile memory +
shapes for 10 steps, then exit) with ``jax.profiler`` traces viewable in
TensorBoard/Perfetto, plus NaN checking via JAX's debug infrastructure.
"""

from __future__ import annotations

import contextlib
import pathlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir, enabled: bool = True) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace of the enclosed block."""
    if not enabled:
        yield
        return
    import jax

    path = pathlib.Path(log_dir)
    path.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(path))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks() -> None:
    """Fail fast on NaNs in any jitted computation (debug aid)."""
    import jax

    jax.config.update("jax_debug_nans", True)


def profile_n_steps(
    step_fn, state, batches, n_steps: int, log_dir, dropout_keys=None
):
    """Run ``n_steps`` under a profiler trace (reference: 10 steps then exit)."""
    import jax

    with trace(log_dir):
        for i, batch in zip(range(n_steps), batches):
            key = dropout_keys[i] if dropout_keys is not None else jax.random.PRNGKey(i)
            state, logs = step_fn(state, batch, key)
        jax.block_until_ready(logs["train_loss"])
    return state, logs
