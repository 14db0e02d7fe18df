"""Edge-dot SDDMM variants on amazon0505 (the 100 MB gather-source cliff)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tcgnn_tpu.config import TileConfig
from tcgnn_tpu.data import synthetic
from tcgnn_tpu.graph import TiledGraph
from tcgnn_tpu.sgt.reorder import reorder_dataset
from tcgnn_tpu.train import _timed_scan_rounds

for name, dim in (("amazon0505", 96), ("amazon0601", 96)):
    ds = synthetic.synthesize(name, dim, 22, seed=0)
    reorder_dataset(ds, "rcm")
    cfg = TileConfig(compute_dtype=jnp.bfloat16, block_group=0)
    g = TiledGraph(ds.row_pointers, ds.column_index, ds.num_nodes, cfg)
    N, E = g.num_nodes, g.num_edges
    rows = jnp.repeat(
        jnp.arange(N, dtype=jnp.int32), jnp.diff(g.row_pointers),
        total_repeat_length=E,
    )
    cols = g.column_index
    x = jnp.zeros((N, 128), jnp.bfloat16) + jnp.asarray(0.01, jnp.bfloat16)
    print(f"=== {name}: N={N} E={E} source={N*128*2/1e6:.0f} MB ===", flush=True)

    def chain(fn):
        @jax.jit
        def run(x, n):
            def body(i, c):
                e = fn(c)
                return c + (1e-30 * e[0]).astype(c.dtype)
            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(out[:1, :1].astype(jnp.float32))
        return _timed_scan_rounds(lambda n: run(x, n), 4, 40) * 1e3

    def mono(c):
        a = jnp.take(c, rows, axis=0, fill_value=0)
        b = jnp.take(c, cols, axis=0, fill_value=0)
        return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=1)

    def split_d(c, parts=2):
        e = jnp.zeros((E,), jnp.float32)
        w = 128 // parts
        for p in range(parts):
            h = c[:, p * w:(p + 1) * w]
            a = jnp.take(h, rows, axis=0, fill_value=0)
            b = jnp.take(h, cols, axis=0, fill_value=0)
            e = e + jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=1)
        return e

    def echunk(c, nc=8):
        cap = -(-E // nc)
        rows_p = jnp.concatenate([rows, jnp.zeros((nc * cap - E,), rows.dtype)])
        cols_p = jnp.concatenate([cols, jnp.zeros((nc * cap - E,), cols.dtype)])
        out = jnp.zeros((nc * cap,), jnp.float32)

        def body(i, out):
            r = jax.lax.dynamic_slice(rows_p, (i * cap,), (cap,))
            cc = jax.lax.dynamic_slice(cols_p, (i * cap,), (cap,))
            a = jnp.take(c, r, axis=0, fill_value=0)
            b = jnp.take(c, cc, axis=0, fill_value=0)
            v = jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=1)
            return jax.lax.dynamic_update_slice(out, v, (i * cap,))

        return jax.lax.fori_loop(0, nc, body, out)[:E]

    t0 = time.perf_counter()
    print(f"  mono        {chain(mono):8.3f} ms  [{time.perf_counter()-t0:.0f}s]", flush=True)
    print(f"  split_d2    {chain(lambda c: split_d(c, 2)):8.3f} ms", flush=True)
    print(f"  split_d4    {chain(lambda c: split_d(c, 4)):8.3f} ms", flush=True)
    print(f"  echunk8     {chain(lambda c: echunk(c, 8)):8.3f} ms", flush=True)
    print(f"  echunk32    {chain(lambda c: echunk(c, 32)):8.3f} ms", flush=True)
