"""Phyloformer-TPU: a TPU-native phylogenetics deep-learning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Phyloformer (lucanest/Phyloformer): given a protein multiple
sequence alignment of ``n`` sequences x ``L`` sites, an axial
linear-attention network predicts all ``n*(n-1)/2`` pairwise evolutionary
distances; a native tree toolkit then builds phylogenies from those
distance matrices.

Subpackages
-----------
- ``data``:     FASTA/newick/PHYLIP codecs, pair indexing, datasets, bucketing.
- ``models``:   the Phyloformer network as functional JAX (param pytrees).
- ``ops``:      scaled linear attention and fused Pallas TPU kernels.
- ``io``:       PyTorch-checkpoint importer (no torch dependency), Orbax ckpts.
- ``infer``:    batched, length-bucketed inference engine + CLI.
- ``train``:    distributed training engine (losses, schedules, trainer, CLI).
- ``parallel``: device meshes and sharding policies (dp + pair-axis sharding).
- ``sim``:      tree & alignment simulators (birth-death, LG+G, indels, Gillespie).
- ``trees``:    distance-based tree building (NJ in Python; BME/NNI/SPR in C++).
- ``bench``:    timing/RSS benchmark harness (CSV schema compatible with the
                reference's ``execution_*.csv``).
"""

from .version import __version__

__all__ = ["__version__"]
