#!/bin/bash
# Round-5 TPU batch 2: final single-kernel CSV (edge-dot SDDMM), GIN sweep,
# reddit single-chip re-measure, prep breakdowns, bench.py consistency runs.
set -x
cd /root/repo
timeout 7000 python -m tcgnn_tpu.bench.sweep --single_kernel --reorder rcm > results_r5/sweep_single_kernel2.log 2>&1
cp 2_tcgnn_single_kernel.csv results_r5/ 2>/dev/null
timeout 7000 python -m tcgnn_tpu.bench.sweep --model gin --reorder rcm > results_r5/sweep_gin.log 2>&1
cp 1_bench_gin.csv Fig_6a_xla_gin.csv results_r5/ 2>/dev/null
timeout 1800 python -m tcgnn_tpu.train --dataset reddit --dim 602 --classes 41 --epochs 30 --dtype bfloat16 > results_r5/reddit_epoch.log 2>&1
timeout 1800 python -m tcgnn_tpu.train --dataset reddit --dim 602 --classes 41 --epochs 50 --dtype bfloat16 --no_hoist > results_r5/reddit_epoch_nohoist.log 2>&1
for d in pubmed cora YeastH; do
  timeout 900 python _exp_prep.py $d > results_r5/prep_$d.log 2>&1
done
timeout 1200 python bench.py > results_r5/bench_run1.json 2>&1
timeout 1200 python bench.py > results_r5/bench_run2.json 2>&1
echo BATCH2_DONE
