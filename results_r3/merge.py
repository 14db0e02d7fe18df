"""Merge the round-2 final re-sweep (results_r3, ours-only) with the
results_r2 baseline columns into Fig_6a CSVs, then render RESULTS.md
tables via results_r2/mk_tables.py.

The GCN/GIN re-sweeps run with ``--skip_baseline`` (the XLA baseline
code did not change between the r2 sweep and the r3 re-sweep; only the
tcgnn_tpu schedule/kernel paths did), so their baseline columns come
from results_r2/Fig_6a_xla_*.csv. The AGNN sweep re-measures both sides.

Run from the repo root:  python results_r3/merge.py gcn gin
"""
import csv
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
R2 = os.path.join(HERE, "..", "results_r2")


def merge(model):
    ours = {
        r["dataset"]: float(r["Avg.Epoch (ms)"])
        for r in csv.DictReader(open(os.path.join(HERE, f"1_bench_{model}.csv")))
    }
    base = {
        r["dataset"]: float(r["xla_baseline"])
        for r in csv.DictReader(open(os.path.join(R2, f"Fig_6a_xla_{model}.csv")))
    }
    out = os.path.join(HERE, f"Fig_6a_xla_{model}.csv")
    written = 0
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["dataset", "xla_baseline", "tcgnn_tpu", "speedup"])
        for ds, t in ours.items():
            if ds in base:
                w.writerow([ds, f"{base[ds]:.3f}", f"{t:.3f}", f"{base[ds] / t:.3f}"])
                written += 1
            else:
                print(f"WARNING: {ds} has no r2 baseline row — dropped")
    print(f"wrote {out} ({written} of {len(ours)} rows)")


if __name__ == "__main__":
    for m in sys.argv[1:] or ["gcn", "gin"]:
        merge(m)
