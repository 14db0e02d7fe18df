"""bench.partition_stats: measured shard stats + v5e roofline sanity."""

import numpy as np

from tcgnn_tpu.bench.partition_stats import roofline, shard_stats
from tcgnn_tpu.config import TileConfig


def test_shard_stats_and_roofline():
    rng = np.random.default_rng(0)
    n = 2000
    deg = rng.poisson(5, n).clip(0, n - 1)
    cols = [np.unique(rng.integers(0, n, d)) for d in deg]
    ptr = np.zeros(n + 1, np.int64)
    np.cumsum([len(c) for c in cols], out=ptr[1:])
    cfg = TileConfig(blk_h=128, blk_w=128)
    rps, shards = shard_stats(ptr.astype(np.int32),
                              np.concatenate(cols).astype(np.int32), n, 4, cfg)
    assert len(shards) == 4 and rps * 4 >= n
    assert sum(s["edges"] for s in shards) == int(ptr[-1])
    for s in shards:
        assert 0 <= s["boundary"] <= n
        assert s["blocks"] >= rps // cfg.blk_h  # >=1 padded block per window
    r = roofline(shards, rps, dim=16, config=cfg)
    assert 0 < r["balance"] <= 1
    assert 0 < r["efficiency"] <= 1
    assert r["efficiency"] <= r["efficiency_split"] <= 1
    assert r["t_local_us"] > 0 and r["t_ici_us"] >= 0
