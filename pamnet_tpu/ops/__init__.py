"""Device-level ops: basis functions, segment reductions, neighbor search,
triplet enumeration, and Pallas kernels."""

from pamnet_tpu.ops.basis import (
    envelope,
    bessel_rbf,
    spherical_basis_edge_rbf,
    spherical_jn_all,
    legendre_cbf,
    spherical_basis,
)
from pamnet_tpu.ops.ell import (
    build_ell_table_np,
    build_offsets_np,
    gather_ell,
    segment_sum_ell,
    segment_sum_sorted,
)
from pamnet_tpu.ops.segment import segment_sum, segment_mean

__all__ = [
    "envelope",
    "bessel_rbf",
    "spherical_basis_edge_rbf",
    "spherical_jn_all",
    "legendre_cbf",
    "spherical_basis",
    "segment_sum",
    "segment_mean",
    "build_ell_table_np",
    "build_offsets_np",
    "gather_ell",
    "segment_sum_ell",
    "segment_sum_sorted",
]
