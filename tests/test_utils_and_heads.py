"""Multi-head AGNN, profiling stats, public export surface."""

import jax
import jax.numpy as jnp
import numpy as np

from tcgnn_tpu.config import TileConfig
from tcgnn_tpu.data.dataset import coo_to_csr
from tcgnn_tpu.data.synthetic import powerlaw_graph
from tcgnn_tpu.graph import TiledGraph
from tcgnn_tpu.models import layers as L
from tcgnn_tpu.utils.profiling import op_stats

CFG = TileConfig(blk_h=16, blk_w=16, edge_chunk=16)


def test_agnn_multihead_well_defined():
    """The reference's multi-head path races all heads onto one output
    buffer (TCGNN_kernel.cu:253-268) and ships with n_heads=1; ours is the
    head-average, which must match single-head when heads share weights and
    differ otherwise."""
    n, d = 120, 12
    src, dst = powerlaw_graph(n, 700, seed=2)
    ptr, cols = coo_to_csr(src, dst, n)
    g = TiledGraph(ptr, cols, n, CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)

    p1 = L.init_agnn(jax.random.PRNGKey(1), d, 8, n_heads=1)
    p2 = {"weights": p1["weights"],
          "attention_w": jnp.tile(p1["attention_w"], (1, 3))}  # 3 equal heads
    out1 = L.agnn_conv(p1, x, g)
    out2 = L.agnn_conv(p2, x, g)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-5)

    p3 = {"weights": p1["weights"],
          "attention_w": jnp.asarray([[0.3, -0.7, 1.1]])}
    out3 = L.agnn_conv(p3, x, g)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))

    # gradients flow through every head
    def loss(p):
        return jnp.sum(L.agnn_conv(p, x, g) ** 2)

    grads = jax.grad(loss)(p3)
    assert np.all(np.abs(np.asarray(grads["attention_w"])) > 0)


def test_op_stats():
    s = op_stats(num_edges=1_000_000, feature_dim=128, seconds=0.001)
    assert s["edges_per_s"] == 1e9
    np.testing.assert_allclose(s["useful_tflops"], 2 * 1e6 * 128 / 1e-3 / 1e12)


def test_public_exports():
    import tcgnn_tpu
    import tcgnn_tpu.ops as ops
    import tcgnn_tpu.models as models
    import tcgnn_tpu.parallel as par

    assert callable(tcgnn_tpu.tiled_graph_from_dataset)
    assert callable(ops.spmm_tc_dense) and callable(ops.sddmm_ref)
    assert "gcn" in models.MODEL_KINDS
    assert callable(par.make_mesh)
