"""Learning-rate schedules.

The reference uses HuggingFace ``get_linear_schedule_with_warmup`` stepped
per optimizer step (`/root/reference/train_distributed.py:151-159`):
linear 0→lr over ``warmup`` steps, then linear lr→0 at ``total`` steps.
Closed form here (no transformers dependency).
"""

from __future__ import annotations

import optax


def linear_warmup_decay(base_lr: float, warmup_steps: int, total_steps: int):
    """HF-equivalent: lr(step) = base * min(step/warmup, max(0, (total-step)/(total-warmup)))."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, float(warmup_steps))
        decay = (float(total_steps) - step) / jnp.maximum(
            1.0, float(total_steps - warmup_steps)
        )
        return base_lr * jnp.clip(jnp.minimum(warm, decay), 0.0, 1.0)

    return schedule


def make_optimizer(
    base_lr: float = 1e-4,
    warmup_steps: int = 5000,
    total_steps: int = 100_000,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """Adam + linear warmup/decay — reference defaults
    (`/root/reference/train_distributed.py:276-315,151-159`)."""
    sched = linear_warmup_decay(base_lr, warmup_steps, total_steps)
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay and weight_decay > 0:
        chain.append(optax.adamw(sched, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(sched))
    return optax.chain(*chain)
