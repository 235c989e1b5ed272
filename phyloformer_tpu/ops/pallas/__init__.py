from .axial_block import fused_axial_block, fused_axial_block_res, fused_kernel_a
from .axial_block_bwd import fused_axial_block_bwd
from .sharded import forward_fused_sharded

__all__ = [
    "fused_axial_block",
    "fused_axial_block_res",
    "fused_axial_block_bwd",
    "fused_kernel_a",
    "forward_fused_sharded",
]
