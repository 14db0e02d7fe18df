"""Measured partition statistics + analytic ICI roofline for the
distributed layer (the quantitative multi-chip scaling argument).

Real multi-chip hardware is unreachable in this environment, so the
virtual-CPU scaling curve (``bench/scaling.py``) can only show the
distributed layer's *overhead* shape — all 8 virtual devices share one
host. This tool instead grounds the scaling story in what IS measurable
here plus published machine constants:

* **measured** per-shard boundary sizes (the exact rows the boundary-only
  halo exchange moves — ``parallel/partition.build_halo`` semantics),
* **measured** per-shard SGT block counts (compute load balance),
* an **analytic** per-op time model on TPU v5e:
    - HBM: 819 GB/s per chip (v5e datasheet),
    - ICI: 45 GB/s per link per direction (v5e, 2D torus),
    - MXU: 197 bf16 TFLOP/s per chip.
  The dense SpMM is HBM-bound (structural-tile reads + row gathers +
  output writes); the halo all_to_all rides ICI and is overlapped with
  the local-class kernel (``parallel/partition.split_local_remote``), so
  predicted scaling efficiency per op is

      eff(G) = T_local(G) / max(T_local(G), T_ici(G))
               x  balance(G)           (straggler factor, measured)

  where T_local is the per-shard HBM/MXU roofline and T_ici the
  max-over-shards halo bytes / ICI bandwidth.

Feature widths are modeled at the TPU lane-padded width (multiples of
128 lanes): a [N, 16] bf16 feature matrix moves through HBM as [N, 128]
tiles, so d=16 and d=128 cost the same — the model uses the padded width
to avoid flattering the comm/compute ratio.

Run (host-only, no devices needed):
  python -m tcgnn_tpu.bench.partition_stats --datasets amazon0601 reddit \
      --shards 2 4 8 --dim 16 --csv results/partition_stats.csv
"""

from __future__ import annotations

import argparse
import csv
import sys

import numpy as np

from tcgnn_tpu.config import DEFAULT_CONFIG, TileConfig
from tcgnn_tpu.sgt.translate import _cdiv, _pad_blocks  # window math shared with the partitioner

# TPU v5e public machine constants (jax-ml.github.io/scaling-book roofline
# numbers; see module docstring).
HBM_BPS = 819e9
ICI_BPS = 45e9
MXU_FLOPS = 197e12
BF16 = 2  # bytes


def _lane_pad(d: int) -> int:
    return max(128, -(-d // 128) * 128)


def shard_stats(row_pointers, column_index, num_nodes, num_shards,
                config: TileConfig = DEFAULT_CONFIG):
    """Measured per-shard stats for a window-aligned 1-D row partition.

    Uses the same shard geometry as ``parallel/partition.partition_csr``
    (windows never cross shards) and the native SGT counter, so the block
    counts match what the distributed ops actually execute.
    """
    from tcgnn_tpu.sgt import native

    blk_h = config.blk_h
    ptr = np.asarray(row_pointers, np.int64)
    cols = np.asarray(column_index, np.int64)
    num_windows = max(_cdiv(num_nodes, blk_h), 1)
    wd = _cdiv(num_windows, num_shards)
    rows_per_shard = wd * blk_h
    n_pad = num_shards * rows_per_shard
    ptr = np.concatenate([ptr, np.full(n_pad + 1 - len(ptr), ptr[-1], np.int64)])

    shards = []
    for s in range(num_shards):
        r0, r1 = s * rows_per_shard, (s + 1) * rows_per_shard
        local_ptr = np.ascontiguousarray(ptr[r0:r1 + 1] - ptr[r0])
        local_cols = cols[ptr[r0]:ptr[r1]]
        uniq = np.unique(local_cols)
        remote = uniq[(uniq < r0) | (uniq >= r1)]
        boundary = int(len(remote))
        # Per-owner request counts — the per-offset ppermute halo pads
        # each owner-offset collective to that offset's max pair count
        # (partition.build_halo offset_caps); the roofline below derives
        # the wire volume from these counts.  Measured-vs-model
        # reconciliation lives in bench/measure_comm.py.
        pair_row = np.bincount(
            remote // rows_per_shard, minlength=num_shards
        ).astype(np.int64)
        if native.available():
            per_win = native.count_blocks(
                local_ptr, np.ascontiguousarray(local_cols, np.int32),
                blk_h, config.blk_w,
            )
        else:  # pragma: no cover - native pass is always built in-tree
            from tcgnn_tpu.sgt.translate import sparse_graph_translate
            per_win = sparse_graph_translate(
                local_ptr, local_cols, rows_per_shard, config,
                emit_chunks=False, build_tiles=False,
            ).block_partition
        blocks = int(_pad_blocks(np.asarray(per_win, np.int64), config).sum())
        shards.append(dict(edges=int(len(local_cols)), boundary=boundary,
                           blocks=blocks, pair_row=pair_row))
    return rows_per_shard, shards


def roofline(shards, rows_per_shard, dim, config: TileConfig = DEFAULT_CONFIG):
    """Analytic per-SpMM time model (seconds) + predicted efficiency."""
    d = _lane_pad(dim)
    t_local, t_ici = [], []
    for s in shards:
        # HBM per shard: int8 structural tiles + gathered input rows at the
        # padded width + output writes. Gathers are the dominant term.
        tile_bytes = s["blocks"] * config.blk_h * config.blk_w  # int8
        gather_bytes = s["blocks"] * config.blk_w * d * BF16
        out_bytes = rows_per_shard * d * BF16
        t_hbm = (tile_bytes + gather_bytes + out_bytes) / HBM_BPS
        t_mxu = s["blocks"] * config.blk_h * config.blk_w * d * 2 / MXU_FLOPS
        t_local.append(max(t_hbm, t_mxu))
    # ICI: the halo runs the quantized partial-pair ppermute rounds
    # (partition.plan_halo_rounds), so the per-device average wire is the
    # scheduled rows / G — near the ideal boundary volume, the program
    # model bench/measure_comm.py reconciles against compiled HLO.
    # (Round 3 modeled per-shard boundary rows; round 4 the global-max
    # all_to_all padding, 1.3-6.8x the ideal.)  The collective moves
    # *logical* bytes (XLA relayouts on the wire), so this uses the
    # un-padded width — HBM above uses the padded one.
    from tcgnn_tpu.parallel.partition import plan_halo_rounds

    g = len(shards)
    pair_counts = [list(map(int, s["pair_row"])) for s in shards]
    _, rounds, _ = plan_halo_rounds(pair_counts)
    wire_rows = sum(sz * len(pairs) for _, sz, pairs in rounds) / max(g, 1)
    t_ici = [wire_rows * max(dim, 8) * BF16 / ICI_BPS] * g
    t_local_max = max(t_local)
    t_ici_max = max(t_ici)
    total_blocks = sum(x["blocks"] for x in shards)
    balance = (total_blocks / len(shards)) / max(
        max(x["blocks"] for x in shards), 1
    )
    comm = t_local_max / max(t_local_max, t_ici_max)
    eff = comm * balance
    # With the mega-window block-stream split (partition.build_split) the
    # stacked grid shrinks to ~ideal + 5% slack regardless of hub windows;
    # the split gates on measured imbalance, so it never makes things worse.
    ideal = -(-total_blocks // len(shards))
    balance_split = (total_blocks / len(shards)) / (ideal + max(ideal // 20, 1))
    return dict(
        t_local_us=t_local_max * 1e6,
        t_ici_us=t_ici_max * 1e6,
        balance=balance,
        efficiency=eff,
        efficiency_split=max(eff, comm * balance_split),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datasets", nargs="+", default=["amazon0601"])
    p.add_argument("--shards", nargs="+", type=int, default=[2, 4, 8])
    p.add_argument("--dim", type=int, default=16,
                   help="feature width of the hot SpMM (GCN hidden=16)")
    p.add_argument("--reorder", default="rcm", choices=["none", "rcm", "community"])
    p.add_argument("--balance", action="store_true",
                   help="apply the window-granular LPT shard balance "
                   "(what --mesh training does on non-BD graphs) before "
                   "measuring")
    p.add_argument("--data_dir", default="tcgnn-ae-graphs/")
    p.add_argument("--csv", default=None)
    args = p.parse_args(argv)

    from tcgnn_tpu import train as train_lib

    rows_out = []
    for name in args.datasets:
        targs = train_lib.build_argparser().parse_args(
            ["--dataset", name, "--dim", str(args.dim), "--classes", "2"]
        )
        ds = train_lib.load_dataset(targs)
        if args.reorder != "none":
            from tcgnn_tpu.sgt.reorder import reorder_dataset

            reorder_dataset(ds, args.reorder)
        for g in args.shards:
            if args.balance:
                import copy

                from tcgnn_tpu.sgt.reorder import balance_dataset

                dsg = copy.copy(ds)  # balance is G-specific; keep ds pristine
                balance_dataset(dsg, g)
            else:
                dsg = ds
            rps, shards = shard_stats(
                dsg.row_pointers, dsg.column_index, dsg.num_nodes, g
            )
            r = roofline(shards, rps, args.dim)
            bmax = max(s["boundary"] for s in shards)
            row = dict(
                dataset=name, shards=g, nodes=ds.num_nodes,
                edges=ds.num_edges, rows_per_shard=rps,
                boundary_max=bmax,
                boundary_frac=round(bmax / max(ds.num_nodes, 1), 4),
                halo_kb=round(bmax * max(args.dim, 8) * BF16 / 1024, 1),
                blocks_balance=round(r["balance"], 3),
                t_local_us=round(r["t_local_us"], 1),
                t_ici_us=round(r["t_ici_us"], 1),
                pred_efficiency=round(r["efficiency"], 3),
                pred_efficiency_split=round(r["efficiency_split"], 3),
            )
            rows_out.append(row)
            print(" ".join(f"{k}={v}" for k, v in row.items()))

    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows_out[0]))
            w.writeheader()
            w.writerows(rows_out)
        print(f"# wrote {args.csv}")


if __name__ == "__main__":
    sys.exit(main())
