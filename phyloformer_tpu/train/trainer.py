"""Training engine: state, jitted train/eval steps, distributed setup.

Replaces the reference's Lightning trainer
(`/root/reference/train_distributed.py:114-205,542-554`) with a functional
JAX design: an explicit ``TrainState`` pytree, one jitted ``train_step`` whose
batch is sharded over the mesh 'data' axis (XLA inserts the gradient psum —
the DDP equivalent), mask-aware losses for bucketed batches, and optional
pair-axis activation sharding for very large alignments.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.params import Params, PhyloformerConfig, init_params
from ..models.phyloformer import forward, pair_mask_from_seq_mask
from ..parallel.mesh import (
    Mesh,
    activation_pair_sharding,
    batch_sharding,
    replicated,
)
from .losses import get_loss, metrics as compute_metrics
from .schedule import linear_warmup_decay, make_optimizer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    loss: str = "mae"  # reference hard-codes L1 (train_distributed.py:428)
    learning_rate: float = 1e-4
    warmup_steps: int = 5000
    total_steps: int = 100_000
    weight_decay: float = 0.0
    grad_clip: float = 0.0
    remat: bool = False
    seed: int = 1337  # reference seed (train_distributed.py:392)
    shard_pairs: bool = False  # shard the pair axis over the 'pair' mesh axis
    # Use the fused Pallas kernels for forward AND backward (analytic custom
    # VJP — no forward recompute). Deterministic only (dropout=0, the
    # published-checkpoint setting). PF_PALLAS_BWD=remat restores the round-1
    # remat backward.
    use_pallas: bool = False
    # Average gradients over this many micro-batches before each optimizer
    # update (optax.MultiSteps): emulates batch_size*grad_accum beyond what
    # fits in HBM (e.g. effective batch 16 at 50x256 needs 30 GB in one
    # step but runs at batch-8 memory with grad_accum=2).  The LR schedule
    # advances once per applied update; `step` counts micro-batches.
    grad_accum: int = 1


TrainState = Dict[str, Any]  # {'params', 'opt_state', 'step'}


def create_train_state(
    cfg: PhyloformerConfig,
    tcfg: TrainConfig,
    params: Optional[Params] = None,
    rng: Optional[jax.Array] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize (or wrap pre-loaded) params + optimizer state."""
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(tcfg.seed)
        params = init_params(rng, cfg)
    else:
        params = jax.tree_util.tree_map(jnp.asarray, params)
    tx = make_optimizer(
        tcfg.learning_rate,
        tcfg.warmup_steps,
        tcfg.total_steps,
        tcfg.weight_decay,
        tcfg.grad_clip,
    )
    if tcfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.grad_accum)
    state: TrainState = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    return state, tx


def _batch_loss(params, batch, cfg, tcfg, loss_fn, dropout_key, act_sharding):
    if tcfg.use_pallas:
        if cfg.dropout:
            raise ValueError("use_pallas training requires dropout=0")
        preds = _forward_pallas_ad(params, batch, cfg)
    else:
        preds = forward(
            params,
            batch["codes"],
            cfg,
            site_mask=batch.get("site_mask"),
            seq_mask=batch.get("seq_mask"),
            dropout_key=dropout_key,
            remat=tcfg.remat,
            act_sharding=act_sharding,
        )
    pair_mask = None
    if batch.get("seq_mask") is not None:
        pair_mask = pair_mask_from_seq_mask(batch["seq_mask"], batch["codes"].shape[1])
    loss = loss_fn(preds, batch["dists"], pair_mask)
    return loss, (preds, pair_mask)


def _forward_pallas_ad(params, batch, cfg):
    """Fused-kernel forward with the fused-kernel backward (analytic custom
    VJP, :mod:`phyloformer_tpu.ops.pallas.axial_block_bwd`).

    ``PF_PALLAS_BWD=remat`` selects the round-1 remat backward (canonical
    XLA re-trace) instead.  There is no site cap: forward and backward both
    switch to L-tiled kernels beyond VMEM residency (2048 fwd / 1024 bwd).
    Setting ``PF_PALLAS_TRAIN_MAX_SITES`` > 0 restores the XLA fallback
    above that length (escape hatch)."""
    import os

    from ..models.phyloformer import build_pairs, embed_alignment, forward
    from ..ops.pallas.autodiff import (
        fused_axial_block_ad,
        fused_axial_block_ad_remat,
    )

    codes = batch["codes"]
    b, n_seqs, seq_len = codes.shape
    interpret = jax.default_backend() != "tpu"  # compiled Pallas is TPU-only
    max_sites = int(os.environ.get("PF_PALLAS_TRAIN_MAX_SITES", "0"))
    if max_sites > 0 and seq_len > max_sites and not interpret:
        return forward(
            params, codes, cfg,
            site_mask=batch.get("site_mask"), seq_mask=batch.get("seq_mask"),
        )
    block_ad = (
        fused_axial_block_ad_remat
        if os.environ.get("PF_PALLAS_BWD", "fused") == "remat"
        else fused_axial_block_ad
    )
    site_mask = batch.get("site_mask")
    seq_mask = batch.get("seq_mask")
    if site_mask is None:
        site_mask = jnp.ones((b, seq_len), bool)
    if seq_mask is None:
        seq_mask = jnp.ones((b, n_seqs), bool)
    pair_mask = pair_mask_from_seq_mask(seq_mask, n_seqs)
    mxu = "highest" if cfg.matmul_precision == "float32" else "default"
    with jax.default_matmul_precision(cfg.matmul_precision):
        x = build_pairs(embed_alignment(params, codes), n_seqs)
        for layer in params["layers"]:
            x = block_ad(x, layer, site_mask, pair_mask, cfg, interpret, mxu)
        h = jax.nn.softplus(x @ params["head"]["w"] + params["head"]["b"])[..., 0]
        m = site_mask[:, None, :].astype(h.dtype)
        return jnp.sum(h * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def make_train_step(
    cfg: PhyloformerConfig,
    tcfg: TrainConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted train step.

    Batch dict: ``codes (B,n,L) int32``, ``dists (B,P) f32``, optional
    ``site_mask (B,L)``, ``seq_mask (B,n)`` bool.  With ``mesh``, the batch is
    sharded over 'data' (gradient allreduce by XLA) and — with
    ``tcfg.shard_pairs`` — activations are sharded over 'pair'.
    """
    loss_fn = get_loss(tcfg.loss)
    sched = linear_warmup_decay(tcfg.learning_rate, tcfg.warmup_steps, tcfg.total_steps)
    act_sharding = (
        activation_pair_sharding(mesh) if (mesh is not None and tcfg.shard_pairs) else None
    )
    # Fully-fused multi-chip path: pair axis sharded AND fused kernels on —
    # one shard_map computes loss + all gradients with the Pallas kernels
    # (manual backward; per-block stats/A1 psums are the only collectives).
    sharded_fused = (
        mesh is not None
        and tcfg.use_pallas
        and tcfg.shard_pairs
        and mesh.shape.get("pair", 1) > 1
    )
    if sharded_fused and cfg.dropout:
        raise ValueError("use_pallas training requires dropout=0")
    # Pallas custom calls don't auto-partition under a GSPMD mesh jit: with
    # a mesh, fused kernels run ONLY through the explicit shard_map path;
    # any fallback under a mesh uses the XLA forward.
    fb_tcfg = dataclasses.replace(
        tcfg, use_pallas=tcfg.use_pallas and mesh is None
    )

    def compute_loss_and_grads(params, batch, dropout_key):
        import os

        max_sites = int(os.environ.get("PF_PALLAS_TRAIN_MAX_SITES", "0"))
        if sharded_fused and (
            max_sites <= 0 or batch["codes"].shape[2] <= max_sites
        ):
            from ..ops.pallas.sharded import sharded_fused_loss_and_grads

            interpret = jax.default_backend() != "tpu"
            loss, grads = sharded_fused_loss_and_grads(
                params, batch, cfg, mesh, tcfg.loss, interpret
            )
            return loss, grads
        (loss, _aux), grads = jax.value_and_grad(_batch_loss, has_aux=True)(
            params, batch, cfg, fb_tcfg, loss_fn, dropout_key, act_sharding
        )
        return loss, grads

    def step_fn(state: TrainState, batch, dropout_key):
        loss, grads = compute_loss_and_grads(state["params"], batch, dropout_key)
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": new_params,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }
        gnorm = optax.global_norm(grads)
        logs = {
            "train_loss": loss,
            "grad_norm": gnorm,
            # with accumulation the schedule advances once per APPLIED
            # update (micro-steps in between hold the previous lr)
            "learning_rate": sched(state["step"] // max(1, tcfg.grad_accum)),
        }
        return new_state, logs

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    bsh, rep = batch_sharding(mesh), replicated(mesh)
    batch_shardings = {
        "codes": bsh, "dists": bsh, "site_mask": bsh, "seq_mask": bsh,
    }
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(None, batch_shardings, rep),
        out_shardings=(None, rep),
    )


def make_eval_step(
    cfg: PhyloformerConfig,
    tcfg: TrainConfig,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Jitted validation step returning the reference's val metrics
    (val_loss/MAE/MRE, `/root/reference/train_distributed.py:169-179`)."""
    loss_fn = get_loss(tcfg.loss)

    def eval_fn(params, batch):
        loss, (preds, pair_mask) = _batch_loss(
            params, batch, cfg, tcfg, loss_fn, None, None
        )
        out = {"val_loss": loss}
        out.update(
            {f"val_{k}": v for k, v in compute_metrics(preds, batch["dists"], pair_mask).items()}
        )
        return out

    return jax.jit(eval_fn)


def pad_batch_to_multiple(batch: Dict[str, np.ndarray], multiple: int) -> Dict[str, np.ndarray]:
    """Pad the batch axis to a multiple (mesh data-axis divisibility) with
    fully-masked rows — they contribute nothing to masked losses/metrics."""
    bsz = batch["codes"].shape[0]
    target = -(-bsz // multiple) * multiple
    if target == bsz:
        return batch
    pad = target - bsz
    out = {}
    for key, arr in batch.items():
        if arr is None:
            out[key] = None
            continue
        pad_block = np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)
        out[key] = np.concatenate([arr, pad_block], axis=0)
    return out


def make_batch(
    alns, trees_vecs, pad_n: int, pad_l: int
) -> Dict[str, np.ndarray]:
    """Assemble a host-side padded batch from parsed alignments + target
    distance vectors (upper-triangle order, :mod:`phyloformer_tpu.data`)."""
    from ..data.pairs import n_pairs
    from ..infer.engine import real_pair_selector

    bsz = len(alns)
    codes = np.zeros((bsz, pad_n, pad_l), dtype=np.int32)
    site_mask = np.zeros((bsz, pad_l), dtype=bool)
    seq_mask = np.zeros((bsz, pad_n), dtype=bool)
    dists = np.zeros((bsz, n_pairs(pad_n)), dtype=np.float32)
    for row, (a, vec) in enumerate(zip(alns, trees_vecs)):
        codes[row, : a.n_seqs, : a.seq_len] = a.codes
        site_mask[row, : a.seq_len] = True
        seq_mask[row, : a.n_seqs] = True
        dists[row, real_pair_selector(pad_n, a.n_seqs)] = vec
    return {"codes": codes, "dists": dists, "site_mask": site_mask, "seq_mask": seq_mask}
