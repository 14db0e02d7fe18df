#!/bin/bash
# Round-4 sweep driver (single code state, real TPU via axon).
#
# Differences from results_r3b/run_sweeps.sh:
#   * epochs now run in ONE device-side fori_loop chunk per rep
#     (train.make_train_step .many), so per-dispatch tunnel overhead
#     (measured 8.7 ms/epoch on DD) no longer contaminates epoch numbers;
#   * single-kernel numbers are kernel-only (in-program chain differencing);
#   * kernels store compute-dtype outputs; BD SpMM is the panel-DMA Pallas
#     kernel; SDDMM is the edge-dot-only chunked path.
set -u
cd /root/repo
R=results_r4

timeout 6000 python -m tcgnn_tpu.bench.sweep --model gcn --epochs 200 \
    --reorder rcm > $R/sweep_gcn.log 2>&1
cp 1_bench_gcn.csv Fig_6a_xla_gcn.csv $R/

timeout 6000 python -m tcgnn_tpu.bench.sweep --model gin --epochs 200 \
    --reorder rcm > $R/sweep_gin.log 2>&1
cp 1_bench_gin.csv Fig_6a_xla_gin.csv $R/

timeout 4000 python -m tcgnn_tpu.bench.sweep --single_kernel --reorder rcm \
    > $R/sweep_single_kernel.log 2>&1
cp 2_tcgnn_single_kernel.csv $R/
timeout 7000 python -m tcgnn_tpu.bench.sweep --model agnn --epochs 100 --baseline_epochs 30 \
    --reorder rcm > $R/sweep_agnn.log 2>&1
cp 1_bench_agnn.csv Fig_6a_xla_agnn.csv $R/

touch $R/sweeps_done

# NOTE (as-run): the agnn stage was executed in two invocations — the first
# covered citeseer..DD and stalled on YeastH due to cross-dataset retained
# executable caches (fixed in sweep.py the same round: clear_caches between
# datasets); the remaining six datasets ran via
#   python -m tcgnn_tpu.bench.sweep --model agnn --epochs 100 \
#       --baseline_epochs 30 --reorder rcm \
#       --datasets YeastH amazon0505 artist com-amazon soc-BlogCatalog amazon0601
# (results_r4/sweep_agnn_tail.log) and the rows were merged by dataset name.
# The single-kernel stage was re-run after fixing the profile chains for
# mixed-precision carries (results_r4/sweep_single_kernel.log).
