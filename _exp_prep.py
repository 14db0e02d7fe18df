"""Warm-prep stage breakdown (task: batch small-graph prep RPCs)."""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tcgnn_tpu.config import TileConfig
from tcgnn_tpu.data import synthetic
from tcgnn_tpu.graph import TiledGraph
from tcgnn_tpu.sgt.reorder import reorder_dataset
from tcgnn_tpu.sgt.translate import sparse_graph_translate, transpose_csr
from tcgnn_tpu.sgt.blockdiag import extract_block_diag

name = sys.argv[1] if len(sys.argv) > 1 else "pubmed"
ds = synthetic.synthesize(name, 500 if name == "pubmed" else 96, 3, seed=0)
reorder_dataset(ds, "rcm")
cfg = TileConfig(compute_dtype=jnp.bfloat16, block_group=0)

# warm everything once
g = TiledGraph(ds.row_pointers, ds.column_index, ds.num_nodes, cfg)
float(jnp.sum(g.spmm(jnp.zeros((ds.num_nodes, 16), jnp.bfloat16))[:1, :1].astype(jnp.float32)))

def t(label, fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:34s} {best*1e3:8.2f} ms")
    return r

print(f"=== {name} (N={ds.num_nodes}, E={len(ds.column_index)}) ===")
t("full TiledGraph (warm)", lambda: TiledGraph(
    ds.row_pointers, ds.column_index, ds.num_nodes, cfg))
tr = t("transpose_csr", lambda: transpose_csr(
    ds.row_pointers, ds.column_index, ds.num_nodes))
t("symmetric detect", lambda: (
    np.array_equal(np.asarray(tr[0], np.int64), np.asarray(ds.row_pointers, np.int64)),
    np.array_equal(np.asarray(tr[1], np.int64), np.asarray(ds.column_index, np.int64)),
))
from tcgnn_tpu.sgt.translate import count_blocks
t("count_blocks", lambda: count_blocks(
    ds.row_pointers, ds.column_index, ds.num_nodes, cfg))
hm = t("sparse_graph_translate(+tiles)", lambda: sparse_graph_translate(
    ds.row_pointers, ds.column_index, ds.num_nodes, cfg,
    emit_chunks=False, build_tiles=True))
t("extract_block_diag probe", lambda: extract_block_diag(
    ds.row_pointers, ds.column_index, ds.num_nodes))
t("upload t_src", lambda: jnp.asarray(tr[2]))
t("upload csr (2 arrays)", lambda: (
    jnp.asarray(np.asarray(ds.row_pointers, np.int32)),
    jnp.asarray(np.asarray(ds.column_index, np.int32)),
))
t("meta.as_jax (lite)", lambda: hm.as_jax(lite=True))
from tcgnn_tpu.sgt.translate import build_a_tiles_host
tiles = t("build_a_tiles_host", lambda: build_a_tiles_host(hm))
t("upload tiles (asarray int8)", lambda: jnp.asarray(tiles.astype(np.int8)))
mj = hm.as_jax(lite=True)
# batched upload alternative: ONE device_put over the whole pytree
host_leaves = [np.asarray(tr[2]), np.asarray(ds.row_pointers, np.int32),
               np.asarray(ds.column_index, np.int32), tiles.astype(np.int8),
               np.asarray(hm.col_ids, np.int32),
               np.asarray(hm.block_window, np.int32),
               np.asarray(hm.block_first_in_window, np.int32)]
t("BATCHED device_put (1 call)", lambda: jax.device_put(host_leaves))
