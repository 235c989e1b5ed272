"""Model configuration and parameter pytrees.

Parameters are plain nested dicts (JAX-idiomatic, Orbax-friendly), channel-last
layout: all linear weights stored ``(in, out)`` so application is ``x @ w + b``.

Architecture defaults replicate the reference
(`/root/reference/phyloformer/model.py:112-123`): 6 blocks, 4 heads, d=64,
dropout 0.0 — 308,449 learnable parameters.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PhyloformerConfig:
    n_blocks: int = 6
    n_heads: int = 4
    embed_dim: int = 64
    dropout: float = 0.0
    in_channels: int = 22  # alphabet size
    ln_eps: float = 1e-5
    # Matmul precision for all dense ops. JAX backends (TPU MXU, and this
    # build's CPU backend too) run fp32 matmuls in reduced precision unless
    # told otherwise; "float32" forces full fp32 accumulation (parity mode),
    # "default" allows the backend's fast path (bf16-class MXU passes).
    matmul_precision: str = "float32"

    @property
    def ffn_dim(self) -> int:
        return 4 * self.embed_dim

    @classmethod
    def from_reference_hparams(cls, hp: Dict[str, Any]) -> "PhyloformerConfig":
        """Build from a reference checkpoint's ``hyper_parameters`` dict.

        The reference constructor takes ``n_blocks/n_heads/h_dim`` but the
        checkpoints store ``nb_blocks/nb_heads/embed_dim`` — a mismatch the
        reference silently swallows via ``**kwargs`` so defaults are always
        used (`/root/reference/infer_alns.py:72-74` vs ``model.py:112-119``).
        We map both spellings properly.
        """
        def pick(*names, default):
            for n in names:
                if n in hp:
                    return hp[n]
            return default

        return cls(
            n_blocks=int(pick("nb_blocks", "n_blocks", default=6)),
            n_heads=int(pick("nb_heads", "n_heads", default=4)),
            embed_dim=int(pick("embed_dim", "h_dim", default=64)),
            dropout=float(pick("dropout", default=0.0)),
        )


Params = Dict[str, Any]


def _linear_init(key, fan_in: int, fan_out: int, dtype) -> Dict[str, jax.Array]:
    """torch.nn.Linear / 1x1 Conv2d default init: kaiming-uniform(a=√5) for
    weights and U(-1/√fan_in, 1/√fan_in) for bias — matches what the
    reference trains from."""
    wk, bk = jax.random.split(key)
    bound_w = math.sqrt(6.0 / fan_in) / math.sqrt(2.0)  # kaiming_uniform a=sqrt(5)
    w = jax.random.uniform(wk, (fan_in, fan_out), dtype, -bound_w, bound_w)
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(bk, (fan_out,), dtype, -bound_b, bound_b)
    return {"w": w, "b": b}


def _attn_init(key, cfg: PhyloformerConfig, dtype) -> Dict[str, jax.Array]:
    d, h = cfg.embed_dim, cfg.n_heads
    kq, kk, kv, ko = jax.random.split(key, 4)
    q = _linear_init(kq, d, h, dtype)
    k = _linear_init(kk, d, h, dtype)
    v = _linear_init(kv, d, d, dtype)
    o = _linear_init(ko, d, d, dtype)
    return {
        "wq": q["w"], "bq": q["b"],
        "wk": k["w"], "bk": k["b"],
        "wv": v["w"], "bv": v["b"],
        "wo": o["w"], "bo": o["b"],
    }


def _norm_init(cfg: PhyloformerConfig, dtype) -> Dict[str, jax.Array]:
    return {
        "scale": jnp.ones((cfg.embed_dim,), dtype),
        "bias": jnp.zeros((cfg.embed_dim,), dtype),
    }


def init_params(key: jax.Array, cfg: PhyloformerConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.n_blocks + 2)
    layers: List[Dict[str, Any]] = []
    for i in range(cfg.n_blocks):
        kr, kc, k1, k2 = jax.random.split(keys[i], 4)
        layers.append(
            {
                "row_norm": _norm_init(cfg, dtype),
                "row_attn": _attn_init(kr, cfg, dtype),
                "col_norm": _norm_init(cfg, dtype),
                "col_attn": _attn_init(kc, cfg, dtype),
                "ffn_norm": _norm_init(cfg, dtype),
                "ffn": {
                    **{k + "1": v for k, v in _linear_init(k1, cfg.embed_dim, cfg.ffn_dim, dtype).items()},
                    **{k + "2": v for k, v in _linear_init(k2, cfg.ffn_dim, cfg.embed_dim, dtype).items()},
                },
            }
        )
    return {
        "embed": _linear_init(keys[-2], cfg.in_channels, cfg.embed_dim, dtype),
        "layers": layers,
        "head": _linear_init(keys[-1], cfg.embed_dim, 1, dtype),
    }


def count_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
