from tcgnn_tpu.ops.spmm import build_a_tiles, spmm_tc, spmm_tc_dense
from tcgnn_tpu.ops.sddmm import sddmm_tc, sddmm_tc_dense
from tcgnn_tpu.ops.reference import spmm_ref, sddmm_ref

__all__ = [
    "build_a_tiles", "spmm_tc", "spmm_tc_dense",
    "sddmm_tc", "sddmm_tc_dense", "spmm_ref", "sddmm_ref",
]
