"""Per-graph attainable SpMM/epoch roofline from measured machine rates.

Round-3 VERDICT #1(c): for graphs where the reference still wins (or
nearly), publish the *attainable* bound each kernel is up against, from
MEASURED machine constants — not nominal peaks — and show how close the
shipped kernels sit to it.

Bound model per SpMM (optimistic: DMA streams and grid-step issue are
assumed perfectly overlapped, so the kernel term is max(), not a sum):

  condensed (dense-tile) path:
    t = gather_rows / GATHER_ROWS_PER_S          (separate XLA op, serial)
      + max((tile + slab + out bytes) / HBM_BPS, grid_steps * STEP_ISSUE_S)

  block-diagonal path:
    t = max((pack + panel + out bytes) / HBM_BPS, grid_steps * STEP_ISSUE_S)

Machine constants (this chip, measured this round — see RESULTS.md):
  * HBM effective copy ~324 GB/s
  * XLA row-gather ~0.39 G rows/s from <=100 MB sources (drops ~3x on
    multi-GB sources)
  * ~0.3 us pipelined issue floor per Pallas grid step (the serial
    0.7-0.9 us small-dot cost overlaps with DMA in the shipped kernels)

Usage (host-only; CPU is fine):
    python -m tcgnn_tpu.bench.roofline_bound \
        [--single_kernel_csv results_r4/2_tcgnn_single_kernel.csv] \
        [--gcn_csv results_r4/1_bench_gcn.csv] \
        [--out results_r4/roofline.csv]

Columns: per-dataset SpMM floor (d=96, the single-kernel config) and its
components, the measured SAG ms and measured/floor ratio, plus a 2-layer
GCN no-hoist epoch floor (2 spmm at the input width + 2 at hidden=16 +
measured-bandwidth elementwise/matmul overhead) with its measured ratio.
A measured/floor ratio near 1 means the kernel sits on the machine's
attainable bound; the bound itself is what a zero-overhead implementation
of the SAME data layout would cost (a different representation could in
principle do better).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

HBM_BPS = 324e9             # measured effective HBM copy (RESULTS.md)
GATHER_ROWS_PER_S = 0.39e9  # measured XLA row-gather, small-source regime
STEP_ISSUE_S = 0.3e-6       # pipelined per-grid-step issue floor
BF16 = 2
BD_GROUP = 8                # ops.spmm.BD_BIN_GROUP


def _pad8(d):
    return max(-(-d // 8) * 8, 8)


def spmm_floor(graph, bdm, d, cfg):
    """(floor_seconds, component dict in seconds) for one SpMM at width d."""
    comp = {}
    if bdm is not None:
        bp = -(-bdm.num_bins // BD_GROUP) * BD_GROUP
        bn = bdm.bin_rows
        kw = len(bdm.offsets) * bn
        d_pad = 128  # the BD kernel always lane-pads features/outputs
        hbm = (
            bp * bn * kw                      # int8 pack
            + 3 * bp * bn * d_pad * BF16      # three feature panels
            + bp * bn * d_pad * BF16          # compute-dtype output
        ) / HBM_BPS
        comp["gather"] = 0.0
        comp["hbm"] = hbm
        comp["steps"] = (bp / BD_GROUP) * STEP_ISSUE_S
        if bdm.res_ptr is not None:
            # residual blockout: per-block [blk_h, d] products + segment sum
            nres = max(len(bdm.res_idx) // 64, 1)
            comp["residual"] = nres * STEP_ISSUE_S
        else:
            comp["residual"] = 0.0
        return (
            comp["gather"] + max(comp["hbm"], comp["steps"])
            + comp["residual"],
            comp,
        )
    meta = graph.meta
    n_blocks = int(meta.num_blocks)
    nw = int(meta.num_windows)
    gather_rows = int(meta.col_ids.shape[0])
    # narrow feature dims stay narrow in the condensed kernel (d_blk pads
    # to 8, not 128) — see ops.spmm._spmm_dense_padded
    d_pad = 128 * -(-d // 128) if d >= 128 else _pad8(d)
    hbm = (
        n_blocks * cfg.blk_h * cfg.blk_w          # int8 tiles
        + gather_rows * d_pad * BF16 * 2          # slab written + read
        + nw * cfg.blk_h * d_pad * BF16           # compute-dtype output
    ) / HBM_BPS
    comp["gather"] = gather_rows / GATHER_ROWS_PER_S
    comp["hbm"] = hbm
    comp["steps"] = (n_blocks / cfg.block_group) * STEP_ISSUE_S
    comp["residual"] = 0.0
    return comp["gather"] + max(comp["hbm"], comp["steps"]), comp


def epoch_floor(graph, bdm, d_in, hidden, cfg, n):
    """2-layer GCN no-hoist epoch floor: 4 spmm + elementwise/matmul HBM."""
    s1, _ = spmm_floor(graph, bdm, d_in, cfg)
    s2, _ = spmm_floor(graph, bdm, hidden, cfg)
    # Non-spmm per-epoch traffic, bf16: the input-width activations are
    # touched ~3x (layer-1 matmul fwd + its dW/dX backward reads), the
    # hidden-width ones ~8x (relu/dropout/matmuls/log-softmax fwd + bwd);
    # Adam params are negligible.
    overhead = (3 * _pad8(d_in) + 8 * _pad8(hidden)) * n * BF16 / HBM_BPS
    return 2 * s1 + 2 * s2 + overhead


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--single_kernel_csv", default="results_r4/2_tcgnn_single_kernel.csv"
    )
    p.add_argument("--gcn_csv", default="results_r4/1_bench_gcn.csv")
    p.add_argument("--datasets", nargs="*", default=None)
    p.add_argument("--out", default="results_r4/roofline.csv")
    args = p.parse_args(argv)

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tcgnn_tpu.bench.datasets import AE_TABLE
    from tcgnn_tpu.config import TileConfig
    from tcgnn_tpu.data import synthetic
    from tcgnn_tpu.graph import TiledGraph
    from tcgnn_tpu.sgt import blockdiag as bd
    from tcgnn_tpu.sgt.reorder import reorder_dataset

    def read_csv(path, key_col, val_col):
        out = {}
        if os.path.exists(path):
            with open(path) as f:
                for row in csv.DictReader(f):
                    try:
                        out[row[key_col]] = float(row[val_col])
                    except (KeyError, ValueError):
                        pass
        return out

    sag = read_csv(args.single_kernel_csv, "dataset", "SAG avg (ms)")
    gcn = read_csv(args.gcn_csv, "dataset", "Avg.Epoch (ms)")

    table = [
        (n, d, c) for n, d, c in AE_TABLE
        if args.datasets is None or n in args.datasets
    ]
    with open(args.out, "w") as f:
        f.write(
            "dataset,path,spmm_floor_ms_d96,gather_ms,hbm_ms,steps_ms,"
            "sag_measured_ms,sag_vs_floor,epoch_floor_ms,"
            "epoch_measured_ms,epoch_vs_floor\n"
        )
        for name, dim, classes in table:
            ds = synthetic.synthesize(name, dim, classes)
            reorder_dataset(ds, "rcm")
            cfg = TileConfig(blk_h=512, blk_w=128, edge_chunk=128)
            g = TiledGraph(ds.row_pointers, ds.column_index, ds.num_nodes, cfg)
            bdm = (
                bd.extract_block_diag(
                    ds.row_pointers, ds.column_index, ds.num_nodes
                )
                if g.block_diag
                else None
            )
            floor96, comp = spmm_floor(g, bdm, 96, cfg)
            ef = epoch_floor(g, bdm, dim, 16, cfg, ds.num_nodes)
            sm = sag.get(name)
            em = gcn.get(name)
            f.write(
                f"{name},{'bd' if bdm is not None else 'condensed'},"
                f"{floor96 * 1e3:.3f},{comp['gather'] * 1e3:.3f},"
                f"{comp['hbm'] * 1e3:.3f},{comp['steps'] * 1e3:.3f},"
                f"{'' if sm is None else f'{sm:.3f}'},"
                f"{'' if sm is None else f'{sm / (floor96 * 1e3):.2f}'},"
                f"{ef * 1e3:.3f},"
                f"{'' if em is None else f'{em:.3f}'},"
                f"{'' if em is None else f'{em / (ef * 1e3):.2f}'}\n"
            )
            f.flush()
            print(f"{name} done", flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
