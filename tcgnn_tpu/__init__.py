"""TPU-native GNN message-passing framework (TC-GNN capabilities, rebuilt).

A from-scratch JAX/Pallas re-design of the TC-GNN system
(YukeWang96/TC-GNN_ATC23): Sparse Graph Translation condenses CSR adjacency
into MXU-sized dense tiles, consumed by Pallas tensor-core SpMM / SDDMM
kernels, with GCN / GIN / AGNN models, a full-graph trainer, benchmark
harness, and a shard_map-based multi-chip distribution layer the reference
never had.
"""

import os as _os

import jax as _jax

# The axon TPU plugin registers its backend regardless of the JAX_PLATFORMS
# env var, so an explicit cpu request (tests, virtual-device meshes, or a
# downed tunnel) must also flip the config knob — otherwise every CLI stalls
# on tunnel initialization it was told to avoid.
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    _jax.config.update("jax_platforms", "cpu")

# Persist XLA compilations across processes (~/.cache/tcgnn_tpu_jax).  On
# tunneled TPU backends a remote compile costs seconds to tens of seconds
# per kernel shape; caching makes prep steady-state one-time per machine —
# the analogue of the reference's ahead-of-time nvcc build (TCGNN.cpp via
# setup.py).  Opt out with TCGNN_TPU_NO_COMPILE_CACHE=1 or by setting
# jax_compilation_cache_dir yourself before importing tcgnn_tpu.
if (
    _os.environ.get("TCGNN_TPU_NO_COMPILE_CACHE") != "1"
    and _jax.config.jax_compilation_cache_dir is None
):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/tcgnn_tpu_jax"),
    )

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
