"""TPU-native GNN message-passing framework (TC-GNN capabilities, rebuilt).

A from-scratch JAX/Pallas re-design of the TC-GNN system
(YukeWang96/TC-GNN_ATC23): Sparse Graph Translation condenses CSR adjacency
into MXU-sized dense tiles, consumed by Pallas tensor-core SpMM / SDDMM
kernels, with GCN / GIN / AGNN models, a full-graph trainer, benchmark
harness, and a shard_map-based multi-chip distribution layer the reference
never had.
"""

from tcgnn_tpu.config import DEFAULT_CONFIG, GPU_REFERENCE_CONFIG, TileConfig
from tcgnn_tpu.graph import TiledGraph, tiled_graph_from_dataset

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_CONFIG",
    "GPU_REFERENCE_CONFIG",
    "TileConfig",
    "TiledGraph",
    "tiled_graph_from_dataset",
]
