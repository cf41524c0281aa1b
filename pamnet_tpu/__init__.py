"""PAMNet-TPU: a TPU-native (JAX/XLA/Pallas) framework for physics-aware
multiplex GNNs over 3D molecular systems.

Re-designed from scratch for TPU hardware with the capability surface of the
reference PyTorch/PyG implementation (XieResearchGroup/Physics-aware-Multiplex-GNN):

* QM9 small-molecule property regression      (reference: main_qm9.py)
* PDBbind protein-ligand binding affinity     (reference: main_pdbbind.py)
* RNA-Puzzles 3D structure candidate scoring  (reference: main_rna_puzzles.py,
                                               inference_rna_puzzles.py)

Design stance (TPU-first, not a port):
* All graph structure is fixed-shape padded integer tensors (``GraphBatch``
  pytree) with validity masks; XLA compiles once per bucket size.
* Graph construction (radius / knn / triplet enumeration) has a host
  (numpy / C++) path for static molecular data and an on-device masked path.
* Basis functions (spherical Bessel / real spherical harmonics) are evaluated
  with closed-form coefficient tables generated numerically at build time
  (no sympy at runtime; reference: utils/sbf.py).
* Data parallelism over a ``jax.sharding.Mesh`` via ``shard_map`` + ``psum``.
"""

from pamnet_tpu.config import Config, PAMNetConfig

__version__ = "0.1.0"

__all__ = ["Config", "PAMNetConfig", "__version__"]
