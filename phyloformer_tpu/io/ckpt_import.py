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


def _to_conv(w: np.ndarray) -> np.ndarray:
    """our (in, out) -> torch Conv2d 1x1 (out, in, 1, 1)."""
    return np.ascontiguousarray(np.asarray(w, np.float32).T)[:, :, None, None]


def _to_lin(w: np.ndarray) -> np.ndarray:
    """our (in, out) -> torch Linear (out, in)."""
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def state_dict_from_params(
    params: Params, cfg: PhyloformerConfig, include_seq2pair: bool = True,
    seq2pair_n: int = 50,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_state_dict`: emit the reference's exact
    161-key ``model.``-prefixed state dict (torch layouts: Conv2d 1x1 kernels
    ``(out,in,1,1)`` for embedding/FFN/head, Linear ``(out,in)`` for the
    attention projections, and the non-learnable ``model.seq2pair`` buffer of
    shape ``(C(n,2), n)`` the shipped checkpoints carry at n=50)."""
    state: Dict[str, np.ndarray] = {}

    def put_norm(key, p):
        state[f"{key}.weight"] = np.asarray(p["scale"], np.float32)
        state[f"{key}.bias"] = np.asarray(p["bias"], np.float32)

    def put_attn(key, p):
        for ours, theirs in [("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "out_proj")]:
            state[f"{key}.{theirs}.weight"] = _to_lin(p[ours])
            state[f"{key}.{theirs}.bias"] = np.asarray(
                p["b" + ours[1]], np.float32
            )

    state["model.embedding_block.0.weight"] = _to_conv(params["embed"]["w"])
    state["model.embedding_block.0.bias"] = np.asarray(params["embed"]["b"], np.float32)
    for i, layer in enumerate(params["layers"]):
        base = f"model.attention_blocks.{i}"
        put_norm(f"{base}.row_norm", layer["row_norm"])
        put_attn(f"{base}.row_attention", layer["row_attn"])
        put_norm(f"{base}.col_norm", layer["col_norm"])
        put_attn(f"{base}.col_attention", layer["col_attn"])
        put_norm(f"{base}.ffn_norm", layer["ffn_norm"])
        state[f"{base}.ffn.0.weight"] = _to_conv(layer["ffn"]["w1"])
        state[f"{base}.ffn.0.bias"] = np.asarray(layer["ffn"]["b1"], np.float32)
        state[f"{base}.ffn.3.weight"] = _to_conv(layer["ffn"]["w2"])
        state[f"{base}.ffn.3.bias"] = np.asarray(layer["ffn"]["b2"], np.float32)
    state["model.pwFNN.0.weight"] = _to_conv(params["head"]["w"])
    state["model.pwFNN.0.bias"] = np.asarray(params["head"]["b"], np.float32)
    if include_seq2pair:
        from ..data.pairs import pair_indices

        i_idx, j_idx = pair_indices(seq2pair_n)
        m = np.zeros((len(i_idx), seq2pair_n), np.float32)
        m[np.arange(len(i_idx)), i_idx] = 1.0
        m[np.arange(len(j_idx)), j_idx] = 1.0
        state["model.seq2pair"] = m
    return state


def save_reference_checkpoint(path, params: Params, cfg: PhyloformerConfig,
                              include_seq2pair: bool = True) -> None:
    """Write a reference-format PyTorch ``.ckpt`` (zip pickle, no torch
    needed) that the reference tooling consumes directly
    (`/root/reference/infer_alns.py:71-82`): top-level ``state_dict`` +
    ``hyper_parameters`` with the reference's key names."""
    import collections

    from .torch_pickle import save_torch_checkpoint

    host = {
        k: np.asarray(v, np.float32)
        for k, v in state_dict_from_params(params, cfg, include_seq2pair).items()
    }
    obj = {
        "state_dict": collections.OrderedDict(host),
        # Both spellings: the shipped checkpoints use nb_blocks/nb_heads/
        # embed_dim, but the reference constructor takes n_blocks/n_heads/
        # h_dim and silently swallows unknown names via **kwargs
        # (`model.py:112-122` vs `infer_alns.py:72-74`) — without the n_*
        # spellings a non-default architecture would silently load as the
        # 6/4/64 default over there.
        "hyper_parameters": {
            "nb_blocks": int(cfg.n_blocks),
            "nb_heads": int(cfg.n_heads),
            "embed_dim": int(cfg.embed_dim),
            "n_blocks": int(cfg.n_blocks),
            "n_heads": int(cfg.n_heads),
            "h_dim": int(cfg.embed_dim),
            "dropout": float(cfg.dropout),
        },
    }
    save_torch_checkpoint(path, obj)
