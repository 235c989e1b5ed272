from .ckpt_import import load_pretrained, params_from_state_dict
from .torch_pickle import load_reference_checkpoint, load_torch_checkpoint

__all__ = [
    "load_pretrained",
    "load_reference_checkpoint",
    "load_torch_checkpoint",
    "params_from_state_dict",
]
