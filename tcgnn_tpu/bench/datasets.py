"""The artifact-evaluation dataset matrix.

Mirror of the fixed 14-graph sweep table in the reference drivers
(``/root/reference/1_bench_gcn.py:10-28`` — name, feature dim, classes).
Graphs load from ``--data_dir`` ``.npz`` files when present (same file
contract as the reference's ``tcgnn-ae-graphs/``) and are synthesized at
matching scale otherwise (zero-egress environment).
"""

# (name, feature_dim, num_classes) — order follows 1_bench_gcn.py.
AE_TABLE = [
    ("citeseer", 3703, 6),
    ("cora", 1433, 7),
    ("pubmed", 500, 3),
    ("ppi", 50, 121),
    ("PROTEINS_full", 29, 2),
    ("OVCAR-8H", 66, 2),
    ("Yeast", 74, 2),
    ("DD", 89, 2),
    ("YeastH", 75, 2),
    ("amazon0505", 96, 22),
    ("artist", 100, 12),
    ("com-amazon", 96, 22),
    ("soc-BlogCatalog", 128, 39),
    ("amazon0601", 96, 22),
]

# Model configs from the reference benchmark drivers.
GCN_CONFIG = dict(num_layers=2, hidden=16)    # 1_bench_gcn.py:5-7
AGNN_CONFIG = dict(num_layers=4, hidden=32)   # 1_bench_agnn.py:5-7
