"""Host-side data pipeline: graph construction, TU-format readers, QM9
parsing, preprocessing tools, and padded batch collation."""

from pamnet_tpu.data.graphbuild import (
    radius_graph_np,
    knn_graph_np,
    remove_self_loops_np,
    edge_distances_np,
    triplets_np,
    pairs_np,
)
from pamnet_tpu.data.batch import (
    GraphBatch,
    PadSizes,
    attach_basis,
    build_graph_batch,
    collate_structures,
    precompute_structure,
)
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.data.tu import TUDataset

__all__ = [
    "attach_basis",
    "collate_structures",
    "precompute_structure",
    "GraphLoader",
    "TUDataset",
    "radius_graph_np",
    "knn_graph_np",
    "remove_self_loops_np",
    "edge_distances_np",
    "triplets_np",
    "pairs_np",
    "GraphBatch",
    "PadSizes",
    "build_graph_batch",
]
