"""Profile the SpMM cost components on a low-degree biomolecule-class graph.

Isolates (on the real TPU, scalar-fetch sync):
  * the condensed-feature gather  xg = x[col_ids]
  * the Pallas block-matmul consuming a pre-gathered xg
  * the fused spmm_tc_dense (gather + kernel)
across tile geometries (blk_h) and feature widths, to find where the
125 ms OVCAR-8H epoch goes (RTX3090 reference: 66 ms).

Usage:  python results/profile_lowdeg.py [dataset] [rounds]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tcgnn_tpu.config import TileConfig
from tcgnn_tpu.data import synthetic
from tcgnn_tpu.graph import TiledGraph
from tcgnn_tpu.sgt.reorder import reorder_dataset


def timeit(fn, *args, rounds=20, chain_arg=None):
    """Chained rounds, scalar-fetch sync; returns ms/round."""
    out = fn(*args)
    _ = float(jnp.sum(out))  # compile + settle
    start = time.perf_counter()
    cur = args
    for _ in range(rounds):
        out = fn(*cur)
        if chain_arg is not None:
            cur = list(cur)
            cur[chain_arg] = out
            cur = tuple(cur)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - start) * 1e3 / rounds


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "OVCAR-8H"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print(f"backend={jax.default_backend()}")
    ds = synthetic.synthesize(name, seed=0)
    reorder_dataset(ds, "rcm")
    print(f"{name}: N={ds.num_nodes} E={ds.num_edges} d={ds.num_features}")

    for blk_h in (512, 128, 64, 32):
        cfg = TileConfig(blk_h=blk_h, blk_w=128, compute_dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        g = TiledGraph(ds.row_pointers, ds.column_index, ds.num_nodes, cfg)
        prep = time.perf_counter() - t0
        meta = g.meta
        nb = meta.num_blocks
        tile_mb = nb * cfg.blk_h * cfg.blk_w / 1e6
        gather_rows = nb * cfg.blk_w
        print(
            f"\nblk_h={blk_h}: blocks={nb} tileMB={tile_mb:.0f} "
            f"gather_rows={gather_rows/1e6:.2f}M prep={prep:.1f}s",
            flush=True,
        )

        for d in (16, 64):
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal(
                    (ds.num_nodes, d)
                ).astype(np.float32)
            )

            garr = g.arrays()

            @jax.jit
            def full_spmm(garr, x):
                return g.bind(garr).spmm(x)

            ms_full = timeit(full_spmm, garr, x, rounds=rounds, chain_arg=1)

            # gather only
            col_ids = meta.col_ids

            @jax.jit
            def gather_only(x, col_ids):
                return jnp.take(
                    x.astype(jnp.bfloat16), col_ids, axis=0, fill_value=0
                )

            ms_gather = timeit(gather_only, x, col_ids, rounds=rounds)

            # kernel only (pre-gathered xg)
            from tcgnn_tpu.ops.spmm import _spmm_grouped_kernel, _round_up
            import functools
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            a_tiles = g._device_arrays[2]
            xg0 = gather_only(x, col_ids)

            @functools.partial(jax.jit, static_argnames=("d_blk",))
            def kernel_only(a_tiles, xg, gwin, gfirst, d_blk):
                kernel = functools.partial(
                    _spmm_grouped_kernel, blk_h=cfg.blk_h, blk_w=cfg.blk_w,
                    group=1, compute_dtype=jnp.bfloat16,
                )
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(1, nb),
                    in_specs=[
                        pl.BlockSpec((1, cfg.blk_h, cfg.blk_w), lambda dd, b, w, f: (b, 0, 0)),
                        pl.BlockSpec((cfg.blk_w, d_blk), lambda dd, b, w, f: (b, dd)),
                    ],
                    out_specs=pl.BlockSpec(
                        (cfg.blk_h, d_blk), lambda dd, b, w, f: (w[b], dd)
                    ),
                )
                return pl.pallas_call(
                    kernel, grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct(
                        (meta.num_windows * cfg.blk_h, d_blk), jnp.float32
                    ),
                )(gwin, gfirst, a_tiles, xg)

            d_blk = _round_up(d, 8) if d < 128 else 128
            gwin = meta.block_window
            gfirst = meta.block_first_in_window
            ms_kernel = timeit(
                kernel_only, a_tiles, xg0, gwin, gfirst, d_blk, rounds=rounds
            )

            print(
                f"  d={d}: full={ms_full:7.2f}ms  gather={ms_gather:7.2f}ms "
                f"kernel={ms_kernel:7.2f}ms", flush=True,
            )


if __name__ == "__main__":
    main()
