from .params import Params, PhyloformerConfig, count_params, init_params
from .phyloformer import (
    axial_block,
    build_pairs,
    embed_alignment,
    forward,
    forward_jit,
    pair_mask_from_seq_mask,
)

__all__ = [
    "Params",
    "PhyloformerConfig",
    "axial_block",
    "build_pairs",
    "count_params",
    "embed_alignment",
    "forward",
    "forward_jit",
    "init_params",
    "pair_mask_from_seq_mask",
]
