from .axial_block import fused_axial_block

__all__ = ["fused_axial_block"]
