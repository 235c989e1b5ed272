"""Orbax checkpointing for training state, with resume and fine-tune paths.

Replaces Lightning's ModelCheckpoint/resume machinery
(`/root/reference/train_distributed.py:449-512,546-548`): periodic saves with
a retained-checkpoint policy, a ``latest`` pointer for resume, and metadata
(config + step + metrics) stored alongside the state.  Also exports our
params back to nothing-fancy ``.npz`` for portability.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for our TrainState dicts."""

    def __init__(self, directory, max_to_keep: Optional[int] = None):
        ocp = _ocp()
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Dict[str, Any], metadata: Optional[Dict] = None):
        ocp = _ocp()
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"metadata": ocp.args.JsonSave(metadata)}
                if metadata is not None
                else {}
            ),
        )
        self._mgr.save(step, args=args)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Optional[Dict] = None):
        ocp = _ocp()
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            args = ocp.args.Composite(state=ocp.args.StandardRestore(template))
        else:
            args = ocp.args.Composite(state=ocp.args.StandardRestore())
        out = self._mgr.restore(step, args=args)
        return out["state"], step

    def restore_metadata(self, step: Optional[int] = None) -> Dict:
        ocp = _ocp()
        step = step if step is not None else self.latest_step()
        try:
            out = self._mgr.restore(
                step, args=ocp.args.Composite(metadata=ocp.args.JsonRestore())
            )
            return out["metadata"] or {}
        except Exception:
            return {}

    def close(self):
        self._mgr.close()


def save_params_npz(path, params: Dict[str, Any]) -> None:
    """Flatten a param pytree to an .npz archive (portable, torch-free)."""
    flat = {}

    def rec(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                rec(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    rec("", params)
    np.savez_compressed(path, **flat)


def load_params_npz(path) -> Dict[str, Any]:
    """Inverse of :func:`save_params_npz`."""
    flat = dict(np.load(path))
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix_lists(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [fix_lists(node[str(i)]) for i in range(len(keys))]
            return {k: fix_lists(v) for k, v in node.items()}
        return node

    return fix_lists(root)
