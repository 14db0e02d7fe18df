"""Measured collective bytes vs the partition model, per dataset.

Turns the predicted-scaling story into an instrumented one (round-3
VERDICT #5): for each graph and mesh size this compiles the REAL
distributed training step on a virtual CPU mesh, parses the optimized
HLO for every collective (parallel.comm_stats), and writes the measured
per-step all-to-all bytes next to the partition model's boundary volume
plus the two-level-mesh DCN fraction.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m tcgnn_tpu.bench.measure_comm [--datasets pubmed ppi]

Output CSV: results/comm_measured.csv
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--datasets", nargs="*",
        default=[
            "pubmed", "ppi", "artist", "amazon0505", "amazon0601",
            "com-amazon", "soc-BlogCatalog", "reddit",
        ],
    )
    p.add_argument("--shards", nargs="*", type=int, default=[4, 8])
    p.add_argument("--dim", type=int, default=16)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--out", default="results/comm_measured.csv")
    args = p.parse_args(argv)

    import os

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    import optax

    from tcgnn_tpu.bench.partition_stats import shard_stats
    from tcgnn_tpu.config import TileConfig
    from tcgnn_tpu.data import synthetic
    from tcgnn_tpu.parallel import make_mesh
    from tcgnn_tpu.parallel.comm_stats import (
        dcn_halo_fraction,
        step_collective_bytes,
    )
    from tcgnn_tpu.parallel.graph import DistributedTiledGraph
    from tcgnn_tpu.parallel.train import (
        init_distributed_net,
        make_distributed_train_step,
    )

    cfg = TileConfig(blk_h=128, blk_w=128, edge_chunk=64)
    rows = []
    f = open(args.out, "w")
    f.write(
        "dataset,shards,measured_a2a_bytes,measured_a2a_count,"
        "measured_ag_bytes,measured_ppermute_bytes,boundary_rows,"
        "modeled_halo_bytes,ratio_measured_vs_model,ideal_boundary_bytes,"
        "padding_overhead,dcn_frac_cph4\n"
    )
    for name in args.datasets:
        ds = synthetic.synthesize(name, args.dim, args.classes)
        for g in args.shards:
            if g * 1 > len(jax.devices()):
                continue
            mesh = make_mesh(n_graph=g, n_feature=1)
            dg = DistributedTiledGraph(
                ds.row_pointers, ds.column_index, ds.num_nodes, mesh, cfg
            )
            rng = np.random.default_rng(0)
            x = dg.shard_features(
                rng.standard_normal((ds.num_nodes, args.dim)).astype(np.float32)
            )
            y = dg.shard_nodes(
                rng.integers(0, args.classes, ds.num_nodes).astype(np.int32)
            )
            params, _, _ = init_distributed_net(
                jax.random.PRNGKey(0), "gcn", x.shape[1], 16, args.classes,
                2, dg,
            )
            opt = optax.adam(0.01)
            # hoist=False: keep the layer-1 halo in the step so the
            # measured program contains the full per-epoch schedule.
            step = make_distributed_train_step(
                dg, "gcn", x, y, opt, 0.5, num_valid_classes=args.classes,
                hoist=False,
            )
            stats = step_collective_bytes(
                step, params, opt.init(params), jax.random.PRNGKey(1),
                num_devices=g,
            )
            _, shards = shard_stats(
                ds.row_pointers, ds.column_index, ds.num_nodes, g, config=cfg
            )
            halo_rows = sum(s["boundary"] for s in shards)

            # Program model (per device, per step): each spmm pass runs one
            # cyclic ppermute per owner offset of the halo plan, each
            # moving cap_o rows at the pass's feature width (total =
            # halo_rows, the per-offset-padded boundary — the round-4
            # global-max all_to_all moved G * capacity rows, 1.3-6.8x the
            # ideal), plus (on split graphs) one partial-tile all-to-all
            # return of G * pair_cap * blk_h rows (parallel/graph.py
            # halo_exchange / _make_guest_return).  The hoist=False 2-layer
            # GCN step runs three passes: layer-1 fwd at the sharded input
            # width, layer-2 fwd and layer-2 dx at the hidden width (dx for
            # layer 1 is not needed — x is constant).  Round 3 modeled ONE
            # pass at boundary ROWS x the padded input width, which
            # over-predicted the measured bytes up to 3x (wrong width per
            # pass) while ignoring capacity padding (under-counts); this
            # model tracks the emitted program.
            def pass_bytes(host, width):
                if dg.streamed:
                    # Streamed shards halo via ONE all_gather of the sharded
                    # feature matrix per pass (result = full matrix per
                    # device).
                    return dg.padded_nodes * width * 4
                b = 0
                if host.halo is not None:
                    # Per-device average wire bytes of the quantized
                    # partial-pair rounds: each ppermute moves its
                    # sub-segment on len(pairs) of the G links only.
                    b += sum(
                        sz * width * 4 * len(pairs) / g
                        for _, sz, pairs in host.halo["rounds"]
                    )
                if host.split is not None:
                    b += g * int(host.split["pair_cap"]) * cfg.blk_h * width * 4
                return b

            hidden = 16
            model_bytes = int(round(
                pass_bytes(dg.host_fwd, x.shape[1])
                + pass_bytes(dg.host_fwd, hidden)
                + pass_bytes(dg.host_bwd, hidden)
            ))
            # Ideal boundary volume of the same three passes (no capacity
            # padding), PER DEVICE like the model and the HLO measurement:
            # what a perfectly packed exchange would move.  The
            # modeled/ideal ratio is the halo padding overhead.
            ideal_bytes = halo_rows * (x.shape[1] + 2 * hidden) * 4 // g
            pc = None
            if dg.host_fwd is not None and dg.host_fwd.halo is not None:
                pc = dg.host_fwd.halo.get("pair_counts")
            dcn = dcn_halo_fraction(pc, 4) if pc is not None else float("nan")
            a2a = stats["all_to_all"]
            # The halo now rides collective-permutes; split partial-tile
            # returns remain all-to-alls.  The model covers both, so the
            # reconciliation compares their SUM.  Streamed shards halo via
            # all_gather instead (see pass_bytes).
            meas = (
                stats["all_gather"]["bytes"]
                if dg.streamed
                else a2a["bytes"] + stats["collective_permute"]["bytes"]
            )
            row = (
                f"{name},{g},{a2a['bytes']},{a2a['count']},"
                f"{stats['all_gather']['bytes']},"
                f"{stats['collective_permute']['bytes']},{halo_rows},"
                f"{model_bytes},"
                f"{meas / model_bytes if model_bytes else float('nan'):.3f},"
                f"{ideal_bytes},"
                f"{model_bytes / ideal_bytes if ideal_bytes else float('nan'):.3f},"
                f"{dcn:.4f}\n"
            )
            f.write(row)
            f.flush()
            print(row.strip(), flush=True)
            rows.append(row)
    f.close()
    print(f"wrote {args.out}")
    return rows


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
