from .attention import layer_norm, phi, scaled_linear_attention

__all__ = ["layer_norm", "phi", "scaled_linear_attention"]
