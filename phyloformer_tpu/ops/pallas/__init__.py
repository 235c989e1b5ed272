from .axial_block import fused_axial_block, fused_axial_block_res
from .axial_block_bwd import fused_axial_block_bwd

__all__ = [
    "fused_axial_block",
    "fused_axial_block_res",
    "fused_axial_block_bwd",
]
