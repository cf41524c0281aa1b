"""Device-level ops: basis functions, segment reductions, neighbor search,
triplet enumeration, and Pallas kernels."""

from pamnet_tpu.ops.basis import (
    envelope,
    bessel_rbf,
    spherical_basis_edge_rbf,
    legendre_cbf,
    spherical_basis,
)
from pamnet_tpu.ops.segment import segment_sum, segment_mean

__all__ = [
    "envelope",
    "bessel_rbf",
    "spherical_basis_edge_rbf",
    "legendre_cbf",
    "spherical_basis",
    "segment_sum",
    "segment_mean",
]
