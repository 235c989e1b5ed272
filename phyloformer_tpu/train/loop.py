"""The fit loop: epochs/steps, periodic validation, early stopping,
checkpointing, metric logging, resume and fine-tune.

Functional replacement for ``lightning.Trainer.fit`` as configured by the
reference (`/root/reference/train_distributed.py:480-554`):
- validation every ``check_val_every`` optimizer steps (default 10,000);
- checkpoint after each validation + ``last`` retained (ModelCheckpoint
  equivalent, ``:483-492``);
- EarlyStopping x2: divergence ceiling on train loss (``:493-503``) and
  no-improvement patience on val loss (``:504-512``);
- scalar logs (train_loss, learning_rate every ``log_every`` steps; val_*
  after each validation) to JSONL (wandb-free observability).
"""

from __future__ import annotations

import dataclasses
import json
import math
import time
from pathlib import Path
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

import jax

from ..io.checkpoint import CheckpointManager
from ..models.params import PhyloformerConfig
from .data import BucketedLoader, LoaderConfig
from .trainer import TrainConfig, create_train_state, make_eval_step, make_train_step


@dataclasses.dataclass
class FitConfig:
    nb_epochs: int = 100  # reference default (train_distributed.py:277)
    max_steps: Optional[int] = None
    check_val_every: int = 10_000
    log_every: int = 100
    hard_loss_ceiling: float = 3.0
    no_improvement_stop: int = 5
    output_dir: str = "."
    run_name: str = "phyloformer"
    keep_checkpoints: Optional[int] = None  # None = keep all (reference save_top_k=-1)
    # optional metric sinks next to the JSONL writer
    use_wandb: bool = False  # offline mode, reference behavior
    use_tensorboard: bool = False
    project_name: str = "PHYLOFORMER_EXPERIMENTS"  # reference default project


class MetricLogger:
    """JSONL metric writer (one object per event), with optional extra sinks
    (wandb / TensorBoard) mirroring the reference's wandb-offline logging
    (`/root/reference/train_distributed.py:363-369`) under the same scalar
    names (train_loss, learning_rate, val_loss, val_mae, val_mre)."""

    def __init__(self, path, sinks: Sequence = ()):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")
        self.sinks = [s for s in sinks if s is not None]

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            if isinstance(v, str):
                rec[k] = v
            elif np.isscalar(v) or hasattr(v, "item"):
                rec[k] = float(v)
            else:
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        numeric = {k: v for k, v in rec.items()
                   if k not in ("step", "time") and isinstance(v, float)}
        for sink in self.sinks:
            sink.log(int(step), numeric)

    def close(self):
        self._fh.close()
        for sink in self.sinks:
            sink.close()


def make_wandb_sink(project: str, run_name: str, save_dir, offline: bool = True,
                    config: Optional[Dict] = None):
    """Optional wandb sink (the reference logs offline and syncs manually,
    `train_distributed.py:364-369`, `README.md:227`).  Returns None with a
    warning when wandb is not installed."""
    try:
        import wandb
    except ImportError:
        print("wandb not installed; metrics go to JSONL only", flush=True)
        return None
    run = wandb.init(
        project=project, name=run_name, dir=str(save_dir),
        mode="offline" if offline else "online", config=config or {},
    )

    class _WandbSink:
        def log(self, step, scalars):
            run.log(scalars, step=step)

        def close(self):
            run.finish()

    return _WandbSink()


def make_tensorboard_sink(logdir):
    """Optional TensorBoard sink (tensorboardX).  Returns None with a warning
    when unavailable."""
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        print("tensorboardX not installed; metrics go to JSONL only", flush=True)
        return None
    writer = SummaryWriter(str(logdir))

    class _TbSink:
        def log(self, step, scalars):
            for k, v in scalars.items():
                writer.add_scalar(k, v, step)

        def close(self):
            writer.close()

    return _TbSink()


def evaluate(eval_step, params, loader: Iterable) -> Dict[str, float]:
    sums: Dict[str, float] = {}
    count = 0
    for batch in loader:
        out = eval_step(params, batch)
        for k, v in out.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
    if count == 0:
        return {}
    return {k: v / count for k, v in sums.items()}


def fit(
    cfg: PhyloformerConfig,
    tcfg: TrainConfig,
    fcfg: FitConfig,
    train_loader: BucketedLoader,
    val_loader: Optional[BucketedLoader] = None,
    mesh=None,
    init_params=None,
    resume: bool = False,
) -> Dict:
    """Run training; returns a summary dict with final state + history."""
    out_dir = Path(fcfg.output_dir)
    run_dir = out_dir / f"checkpoints_{fcfg.run_name}"
    sinks = []
    if fcfg.use_wandb:
        sinks.append(make_wandb_sink(
            fcfg.project_name, fcfg.run_name, out_dir,
            config=dataclasses.asdict(tcfg),
        ))
    if fcfg.use_tensorboard:
        sinks.append(make_tensorboard_sink(out_dir / f"tb_{fcfg.run_name}"))
    logger = MetricLogger(out_dir / f"{fcfg.run_name}_metrics.jsonl", sinks=sinks)
    ckpt = CheckpointManager(run_dir, max_to_keep=fcfg.keep_checkpoints)

    state, tx = create_train_state(cfg, tcfg, params=init_params)
    if resume and ckpt.latest_step() is not None:
        state, restored_step = ckpt.restore(template=jax.tree_util.tree_map(np.asarray, state))
        print(f"resumed from step {restored_step}")

    train_step = make_train_step(cfg, tcfg, tx, mesh=mesh)
    eval_step = make_eval_step(cfg, tcfg, mesh=mesh)

    if mesh is not None:
        from ..parallel.mesh import shard_batch as _shard
        from .trainer import pad_batch_to_multiple

        ndata = mesh.shape.get("data", 1)

        def prep(batch):
            return _shard(mesh, pad_batch_to_multiple(batch, ndata))
    else:
        def prep(batch):
            return batch

    rng = jax.random.PRNGKey(tcfg.seed)
    step = int(state["step"])
    best_val = math.inf
    bad_checks = 0
    stop_reason = None
    t_start = time.time()

    # Preemption safety: SIGTERM/SIGINT requests a checkpoint + clean stop at
    # the next step boundary (the reference had nothing beyond manual resume).
    import signal

    preempted = {"flag": False}

    def _handle(signum, frame):
        preempted["flag"] = True

    old_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            old_handlers[sig] = signal.signal(sig, _handle)
        except ValueError:  # not main thread
            pass

    def run_validation():
        nonlocal best_val, bad_checks, stop_reason
        # no val set (e.g. --packed-data without a val dir): still
        # checkpoint on the validation cadence — a multi-hour run that
        # saves nothing until the end is not resumable after preemption
        metrics = {}
        if val_loader is not None:
            metrics = evaluate(eval_step, state["params"], map(prep, val_loader))
        if metrics:
            logger.log(step, **metrics)
            val_loss = metrics.get("val_loss", math.inf)
            if val_loss < best_val - 1e-12:
                best_val = val_loss
                bad_checks = 0
            else:
                bad_checks += 1
                if bad_checks >= fcfg.no_improvement_stop:
                    stop_reason = (
                        f"early stop: no val improvement for {bad_checks} checks"
                    )
        ckpt.save(
            step,
            jax.tree_util.tree_map(np.asarray, state),
            metadata={
                "step": step,
                "val": metrics,
                "config": dataclasses.asdict(cfg),
                "train_config": dataclasses.asdict(tcfg),
            },
        )

    for epoch in range(fcfg.nb_epochs):
        if stop_reason:
            break
        for batch in train_loader:
            rng, key = jax.random.split(rng)
            state, logs = train_step(state, prep(batch), key)
            step = int(state["step"])
            train_loss = float(logs["train_loss"])
            if not math.isfinite(train_loss):
                stop_reason = f"divergence stop: train_loss={train_loss}"
                logger.log(step, train_loss=train_loss, event="divergence_stop")
                break
            # Loss-ceiling divergence stop, checked at every logging boundary.
            # The reference's EarlyStopping(divergence_threshold) fires on the
            # most recently logged train_loss at each check
            # (`/root/reference/train_distributed.py:493-503`); checking every
            # log_every steps rather than only at validation boundaries means a
            # divergent run stops within ~log_every steps instead of burning up
            # to check_val_every (10k) steps.
            if (
                fcfg.log_every
                and step % fcfg.log_every == 0
                and train_loss > fcfg.hard_loss_ceiling
            ):
                stop_reason = (
                    f"divergence stop: train_loss={train_loss} > "
                    f"{fcfg.hard_loss_ceiling}"
                )
                logger.log(step, train_loss=train_loss, event="divergence_stop")
                break
            if step % fcfg.log_every == 0:
                logger.log(
                    step,
                    train_loss=train_loss,
                    learning_rate=float(logs["learning_rate"]),
                    grad_norm=float(logs["grad_norm"]),
                    epoch=epoch,
                )
            if fcfg.check_val_every and step % fcfg.check_val_every == 0:
                run_validation()
            if preempted["flag"]:
                stop_reason = "preemption signal: checkpointing and stopping"
            if stop_reason or (fcfg.max_steps and step >= fcfg.max_steps):
                stop_reason = stop_reason or f"max_steps {fcfg.max_steps} reached"
                break

    run_validation()  # final val + checkpoint
    for sig, handler in old_handlers.items():
        signal.signal(sig, handler)
    logger.close()
    summary = {
        "state": state,
        "steps": step,
        "best_val_loss": best_val if best_val < math.inf else None,
        "stop_reason": stop_reason or "completed all epochs",
        "wall_time_s": time.time() - t_start,
        "checkpoint_dir": str(run_dir),
    }
    ckpt.close()
    return summary
