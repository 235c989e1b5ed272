"""Losses and metrics for distance-vector training.

The reference hard-codes ``torch.nn.L1Loss`` (MAE) at
`/root/reference/train_distributed.py:428` and computes MAE/MRE val metrics
(`:28-44`); the published PF checkpoint lineage additionally used an MRE
fine-tuning loss (`/root/reference/README.md:68-69`) that the shipped trainer
cannot express — here both are first-class.  All reductions are mask-aware so
bucketed/padded batches train exactly.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

EPS = 1e-8


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def mae_loss(preds, targets, mask=None):
    """Mean absolute error — the reference's L1 training loss."""
    return _masked_mean(jnp.abs(preds - targets), mask)


def mre_loss(preds, targets, mask=None):
    """Mean relative error |pred-true|/true — PF fine-tuning loss
    (`/root/reference/train_distributed.py:38-44` metric form)."""
    return _masked_mean(jnp.abs(preds - targets) / (targets + EPS), mask)


def mse_loss(preds, targets, mask=None):
    return _masked_mean(jnp.square(preds - targets), mask)


LOSSES: Dict[str, Callable] = {"mae": mae_loss, "l1": mae_loss, "mre": mre_loss, "mse": mse_loss}


def get_loss(name: str) -> Callable:
    try:
        return LOSSES[name.lower()]
    except KeyError as err:
        raise ValueError(f"unknown loss {name!r}; options: {sorted(LOSSES)}") from err


def metrics(preds, targets, mask=None) -> Dict[str, jnp.ndarray]:
    """Validation metrics of the reference (`train_distributed.py:28-44`)."""
    return {
        "mae": mae_loss(preds, targets, mask),
        "mre": mre_loss(preds, targets, mask),
        "rmse": jnp.sqrt(mse_loss(preds, targets, mask)),
    }
