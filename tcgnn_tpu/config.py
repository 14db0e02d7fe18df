"""Tiling / kernel configuration for the TPU-native TC-GNN framework.

The reference keeps its tile geometry in a compile-time C header
(``TCGNN_conv/config.h:4-6``: BLK_H=16, BLK_W=8, WARP_SIZE=32) mirrored by a
Python module (``config.py:1-9``).  On TPU the natural tile is the MXU's
128x128 systolic array (f32 min tile 8x128), so the defaults differ, but the
geometry stays fully configurable so the SGT analytics can still be run at
the reference's 16x8 geometry for parity checks.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Geometry of the Sparse-Graph-Translation tiling.

    Attributes:
      blk_h: rows per row-window (output tile height).  GPU reference uses 16
        (one WMMA fragment); on TPU we default to the MXU-aligned 128.
      blk_w: condensed columns per TC block (contraction tile width).  GPU
        reference uses 8; TPU MXU wants 128.
      edge_chunk: edges per uniform kernel chunk.  The Pallas kernels stream
        edges in fixed-size chunks so the grid is regular even on power-law
        graphs; each block's edge list is padded to a multiple of this.
      compute_dtype: dtype fed to the MXU for feature/one-hot matmuls.  f32
        for exactness in tests; bf16 for peak MXU throughput in benchmarks
        (one-hot operands are exact in bf16 either way).
    """

    # 512-row windows measure best on TPU: SGT math is per-window, so taller
    # windows dedup more neighbors (fewer condensed-gather rows) AND cut the
    # kernel grid-step count; the MXU happily takes [512,128]x[128,d] tiles.
    blk_h: int = 512
    blk_w: int = 128
    edge_chunk: int = 128
    compute_dtype: jnp.dtype = jnp.float32
    # TC blocks per dense-kernel grid step.  >1 makes each grid step DMA
    # `block_group` consecutive tiles in one transfer, but SGT must pad every
    # window's block count to a multiple of it — the padding inflates the
    # condensed-gather row count, so sparse-window graphs want 1 while
    # block-dense windows measure ~15-35% faster at 2 (ppi 0.82->0.70 ms,
    # amazon0601 6.13->5.19 ms per SpMM; round-4 re-measurement — the
    # round-1 "grouping never helps" verdict predates the scratch-
    # accumulating compute-dtype kernel).  0 = AUTO: TiledGraph resolves it
    # per graph from the real block/window density (>=8 blocks per window
    # -> 2, else 1) with one extra native count pass.
    block_group: int = 1

    @property
    def row_sentinel(self) -> int:
        """Row value marking a padding edge slot.

        One-hot row build uses ``iota(blk_h) == r``; a sentinel of ``blk_h``
        matches nothing, so padded slots contribute exactly zero (the TPU
        analogue of the reference leaving untouched zeros in its shared-mem
        tile, ``TCGNN_kernel.cu:399-408``).
        """
        return self.blk_h


# Reference GPU geometry, kept for analytics parity with
# /root/reference/TCGNN_conv/config.h and 3_cnt_TC_blk_SpMM.py.
GPU_REFERENCE_CONFIG = TileConfig(blk_h=16, blk_w=8, edge_chunk=32)

# Default TPU geometry.
DEFAULT_CONFIG = TileConfig()
