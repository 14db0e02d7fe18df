"""Render RESULTS.md tables from the round-2 sweep CSVs (single code state)."""
import csv, sys

REF = {  # BASELINE.md RTX3090 GCN avg epoch ms
    "citeseer": 3.031, "cora": 2.971, "pubmed": 2.793, "ppi": 4.833,
    "PROTEINS_full": 2.722, "OVCAR-8H": 66.381, "Yeast": 61.057,
    "DD": 11.429, "amazon0505": 23.806, "artist": 4.994,
    "com-amazon": 17.365, "soc-BlogCatalog": 10.130, "amazon0601": 20.310,
}

def table(model):
    rows = list(csv.DictReader(open(f"Fig_6a_xla_{model}.csv")))
    print(f"\n### {model.upper()}\n")
    hdr = "| dataset | XLA baseline (ms) | tcgnn-tpu (ms) | speedup |"
    if model == "gcn":
        hdr += " RTX3090 ref (ms) | vs ref |"
    print(hdr)
    print("|---" * hdr.count("|") + "|" if False else "|" + "---|" * (hdr.count("|") - 1))
    import math
    geos = []
    for r in rows:
        line = f"| {r['dataset']} | {float(r['xla_baseline']):.3f} | {float(r['tcgnn_tpu']):.3f} | {float(r['speedup']):.2f}x |"
        geos.append(float(r['speedup']))
        if model == "gcn":
            ref = REF.get(r['dataset'])
            if ref:
                line += f" {ref:.3f} | **{ref/float(r['tcgnn_tpu']):.2f}x** |"
            else:
                line += " — | — |"
        print(line)
    g = math.exp(sum(math.log(x) for x in geos)/len(geos))
    print(f"\ngeomean speedup vs XLA baseline: **{g:.1f}x**")
    if model == "gcn":
        vs = [REF[r['dataset']]/float(r['tcgnn_tpu']) for r in rows if r['dataset'] in REF]
        g2 = math.exp(sum(math.log(x) for x in vs)/len(vs))
        ahead = sum(1 for x in vs if x >= 0.995)
        print(f"vs RTX3090 ref: ahead/at parity on {ahead} of {len(vs)}, geomean {g2:.2f}x")

for m in sys.argv[1:]:
    table(m)
