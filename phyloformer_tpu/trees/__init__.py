from .likelihood import log_likelihood, log_likelihood_ratio
from .nj import neighbor_joining

__all__ = [
    "log_likelihood",
    "log_likelihood_ratio",
    "neighbor_joining",
]

# heavier, optional imports (compile the C++ lib on demand):
#   from phyloformer_tpu.trees import native      — BME/NNI/SPR + comparisons
#   from phyloformer_tpu.trees import baselines   — Hamming/ML-FastME, FastTree
