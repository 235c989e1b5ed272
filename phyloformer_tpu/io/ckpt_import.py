"""Map reference PyTorch checkpoints onto our parameter pytrees.

Key schema of the 161-tensor reference state dict (all 5 shipped checkpoints;
see `/root/reference/infer_alns.py:75-82` for the consuming code):

    model.embedding_block.0.{weight,bias}                 Conv1x1 22→64
    model.attention_blocks.{i}.{row,col}_attention.{k,q,v,out}_proj.{weight,bias}
    model.attention_blocks.{i}.{row,col,ffn}_norm.{weight,bias}
    model.attention_blocks.{i}.ffn.{0,3}.{weight,bias}    Conv1x1 64→256→64
    model.pwFNN.0.{weight,bias}                           Conv1x1 64→1
    model.seq2pair                                        (1225, 50) buffer — dropped

Layout conversion: torch Conv2d 1x1 kernels are ``(out, in, 1, 1)`` and
Linear weights ``(out, in)``; our channel-last convention stores ``(in, out)``
so application is ``x @ w``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from ..models.params import Params, PhyloformerConfig
from .torch_pickle import load_reference_checkpoint


def _lin(state: Dict[str, np.ndarray], key: str) -> Tuple[np.ndarray, np.ndarray]:
    """torch Linear/Conv1x1 -> (w (in,out), b (out,)) float32."""
    w = np.asarray(state[f"{key}.weight"], dtype=np.float32)
    b = np.asarray(state[f"{key}.bias"], dtype=np.float32)
    if w.ndim == 4:  # Conv2d 1x1: (out, in, 1, 1)
        w = w[:, :, 0, 0]
    return np.ascontiguousarray(w.T), b


def params_from_state_dict(
    state: Dict[str, np.ndarray], cfg: PhyloformerConfig
) -> Params:
    p = "model." if any(k.startswith("model.") for k in state) else ""

    def norm(key: str) -> Dict[str, np.ndarray]:
        return {
            "scale": np.asarray(state[f"{key}.weight"], dtype=np.float32),
            "bias": np.asarray(state[f"{key}.bias"], dtype=np.float32),
        }

    def attn(key: str) -> Dict[str, np.ndarray]:
        wq, bq = _lin(state, f"{key}.q_proj")
        wk, bk = _lin(state, f"{key}.k_proj")
        wv, bv = _lin(state, f"{key}.v_proj")
        wo, bo = _lin(state, f"{key}.out_proj")
        return {"wq": wq, "bq": bq, "wk": wk, "bk": bk,
                "wv": wv, "bv": bv, "wo": wo, "bo": bo}

    layers = []
    for i in range(cfg.n_blocks):
        base = f"{p}attention_blocks.{i}"
        w1, b1 = _lin(state, f"{base}.ffn.0")
        w2, b2 = _lin(state, f"{base}.ffn.3")
        layers.append(
            {
                "row_norm": norm(f"{base}.row_norm"),
                "row_attn": attn(f"{base}.row_attention"),
                "col_norm": norm(f"{base}.col_norm"),
                "col_attn": attn(f"{base}.col_attention"),
                "ffn_norm": norm(f"{base}.ffn_norm"),
                "ffn": {"w1": w1, "b1": b1, "w2": w2, "b2": b2},
            }
        )

    ew, eb = _lin(state, f"{p}embedding_block.0")
    hw, hb = _lin(state, f"{p}pwFNN.0")
    return {"embed": {"w": ew, "b": eb}, "layers": layers, "head": {"w": hw, "b": hb}}


def load_pretrained(path) -> Tuple[Params, PhyloformerConfig, Dict[str, Any]]:
    """Load model weights from any supported container.

    - reference PyTorch zip ``.ckpt`` (torch-free importer);
    - our ``.npz`` param export (:func:`..io.checkpoint.save_params_npz`);
    - an Orbax checkpoint directory written by the trainer.
    Returns ``(params, config, metadata)``.
    """
    import pathlib

    p = pathlib.Path(path)
    if p.is_dir():  # orbax checkpoint dir from pf-train
        from .checkpoint import CheckpointManager

        mgr = CheckpointManager(p)
        state, step = mgr.restore()
        meta = mgr.restore_metadata()
        mgr.close()
        params = state["params"] if "params" in state else state
        cfg_dict = (meta or {}).get("config", {})
        cfg = PhyloformerConfig(**cfg_dict) if cfg_dict else _infer_config(params)
        return params, cfg, {"step": step, **(meta or {})}
    if p.suffix == ".npz":
        from .checkpoint import load_params_npz

        params = load_params_npz(p)
        return params, _infer_config(params), {}
    state, hparams = load_reference_checkpoint(path)
    cfg = PhyloformerConfig.from_reference_hparams(hparams)
    return params_from_state_dict(state, cfg), cfg, hparams


def _infer_config(params: Params) -> PhyloformerConfig:
    """Derive the architecture from parameter shapes."""
    d = int(np.asarray(params["embed"]["w"]).shape[1])
    n_blocks = len(params["layers"])
    n_heads = int(np.asarray(params["layers"][0]["row_attn"]["wq"]).shape[1])
    return PhyloformerConfig(n_blocks=n_blocks, n_heads=n_heads, embed_dim=d)
