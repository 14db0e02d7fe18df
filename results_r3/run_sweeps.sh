#!/bin/bash
# Round-2 final re-sweep driver (single code state, real TPU via axon).
# GCN/GIN re-measure ours only (baseline code unchanged since results_r2);
# AGNN re-measures ours on all graphs + baselines for the graphs missing
# from results_r2 (its r2 sweep predates the block-diagonal AGNN path).
set -u
cd /root/repo
R3=results_r3

stamp() { date +%H:%M:%S; }

echo "[$(stamp)] GCN ours-only sweep"
timeout 3000 python -m tcgnn_tpu.bench.sweep --model gcn --epochs 50 \
    --reorder rcm --skip_baseline 2>&1 | tee $R3/sweep_gcn.log
mv -f 1_bench_gcn.csv $R3/ 2>/dev/null
rm -f Fig_6a_xla_gcn.csv

echo "[$(stamp)] GIN ours-only sweep"
timeout 3000 python -m tcgnn_tpu.bench.sweep --model gin --epochs 50 \
    --reorder rcm --skip_baseline 2>&1 | tee $R3/sweep_gin.log
mv -f 1_bench_gin.csv $R3/ 2>/dev/null
rm -f Fig_6a_xla_gin.csv

echo "[$(stamp)] AGNN ours-only sweep"
timeout 4500 python -m tcgnn_tpu.bench.sweep --model agnn --epochs 30 \
    --reorder rcm --skip_baseline 2>&1 | tee $R3/sweep_agnn.log
mv -f 1_bench_agnn.csv $R3/ 2>/dev/null
rm -f Fig_6a_xla_agnn.csv

echo "[$(stamp)] AGNN baselines (graphs missing from results_r2)"
# r2 already has: citeseer cora pubmed ppi PROTEINS_full
timeout 6000 python - <<'EOF' 2>&1 | tee results_r3/sweep_agnn_base.log
import csv, gc, traceback
import jax
from tcgnn_tpu.bench import baseline as xla_baseline
from tcgnn_tpu.bench.datasets import AE_TABLE

have = {"citeseer", "cora", "pubmed", "ppi", "PROTEINS_full"}
rows = []
for name, dim, classes in AE_TABLE:
    if name in have:
        continue
    print(f"=== {name} baseline (dim={dim}) ===", flush=True)
    try:
        ms = xla_baseline.main([
            "--dataset", name, "--dim", str(dim), "--classes", str(classes),
            "--epochs", "10", "--model", "agnn", "--num_layers", "4",
            "--hidden", "32", "--dtype", "bfloat16",
            "--data_dir", "tcgnn-ae-graphs/",
        ])
        rows.append((name, ms))
    except Exception:
        traceback.print_exc()
        jax.clear_caches()
    gc.collect()
    with open("results_r3/agnn_baseline_extra.csv", "w") as f:
        f.write("dataset,xla_baseline\n")
        for n, m in rows:
            f.write(f"{n},{m:.3f}\n")
EOF
echo "[$(stamp)] all sweeps done"
