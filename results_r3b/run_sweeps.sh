#!/bin/bash
# Round-3 sweep driver (single code state, real TPU via axon).
#
# Differences from results_r3/run_sweeps.sh (round-2 advisor findings):
#   * sweep.py now writes its CSVs INCREMENTALLY, so an outer timeout
#     loses at most the in-flight dataset — no silent all-or-nothing mv;
#   * baselines are re-measured fresh for every model at the SAME epoch
#     count as the 'ours' runs (AGNN 30, GCN/GIN 50) in the same session;
#   * the GCN/GIN 'ours' runs measure BOTH schedules (primary column is
#     the like-for-like --no_hoist number; the hoisted default rides in
#     Fig_6a_xla_<model>.csv's tcgnn_tpu_hoisted column).
set -u
cd /root/repo
R=results_r3b

timeout 7000 python -m tcgnn_tpu.bench.sweep --model agnn --epochs 30 \
    --reorder rcm > $R/sweep_agnn.log 2>&1
cp 1_bench_agnn.csv Fig_6a_xla_agnn.csv $R/

timeout 6000 python -m tcgnn_tpu.bench.sweep --model gcn --epochs 50 \
    --reorder rcm > $R/sweep_gcn.log 2>&1
cp 1_bench_gcn.csv Fig_6a_xla_gcn.csv $R/

timeout 6000 python -m tcgnn_tpu.bench.sweep --model gin --epochs 50 \
    --reorder rcm > $R/sweep_gin.log 2>&1
cp 1_bench_gin.csv Fig_6a_xla_gin.csv $R/

# Per-kernel MFU sweep (dim 96, 2_tcgnn_single_kernel.py analogue).
timeout 4000 python -m tcgnn_tpu.bench.sweep --single_kernel --reorder rcm \
    > $R/sweep_single_kernel.log 2>&1
cp 2_tcgnn_single_kernel.csv $R/
