"""Headline benchmark: GCN full-graph training epoch time vs the reference.

Reproduces the reference's flagship configuration — 2-layer GCN, hidden 16,
200 timed epochs after 10 warm-ups (``/root/reference/1_bench_gcn.py:5-7``,
``main_tcgnn.py:166-181``) — on a pubmed-scale graph and compares the
average epoch time against the archived RTX3090 measurement
(``/root/reference/logs/RTX3090_GCN.csv:4`` → 2.793 ms; see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": speedup}
(vs_baseline > 1 means faster than the reference GPU.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_MS = 2.793  # RTX3090, GCN 2L h16, pubmed (logs/RTX3090_GCN.csv:4)


def _tpu_reachable(timeout_s: int = 240) -> bool:
    """Probe the axon tunnel in a subprocess: when the tunnel is down even
    ``jax.devices()`` hangs indefinitely (CLAUDE.md), which would leave the
    driver without its JSON line.  On failure we fall back to an honestly
    labeled CPU run ("backend": "cpu" in the output)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "assert jax.default_backend() == 'tpu';"
             "assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    if not _tpu_reachable():
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon ignores env alone

    import jax.numpy as jnp
    import numpy as np
    import optax

    from tcgnn_tpu.config import TileConfig
    from tcgnn_tpu.data import synthetic
    from tcgnn_tpu.graph import tiled_graph_from_dataset
    from tcgnn_tpu.models import nets
    from tcgnn_tpu.train import make_train_step

    on_tpu = jax.default_backend() == "tpu"
    # pubmed scale: 19717 nodes / 88k edges / dim 500 / 3 classes
    # (1_bench_gcn.py:12, dataset table in SURVEY.md §6).
    ds = synthetic.synthesize("pubmed", seed=0)
    cfg = TileConfig(compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    t0 = time.perf_counter()
    graph = tiled_graph_from_dataset(ds, cfg)
    prep_ms = (time.perf_counter() - t0) * 1e3
    # Warm prep: a second build in the same process — scatter/upload
    # executables and the translate pass's allocations are warm, so this
    # is the number a long-lived service pays per graph (driver-cold prep
    # above includes one-off compile-cache loads through the tunnel).
    t0 = time.perf_counter()
    graph = tiled_graph_from_dataset(ds, cfg)
    prep_warm_ms = (time.perf_counter() - t0) * 1e3

    x = jnp.asarray(ds.x)
    y = jnp.asarray(ds.y.astype(np.int32))
    optimizer = optax.adam(0.01)
    # CPU fallback keeps the run short: it exists only so the driver always
    # gets its JSON line while the tunnel is down.
    epochs, reps = (200, 3) if on_tpu else (10, 2)

    def measure(hoist, kind="gcn", hidden=16, layers=2, n_epochs=None,
                n_reps=None):
        """MEDIAN-of-N avg epoch ms: a single rep is tunnel-variance-prone
        in both directions (BENCH_r04 regressed 14% vs the same config's
        sweep on one sample), and best-of-N biases low on noisy chains —
        the median of >=3 in-program epoch chains is robust to one stall
        AND one lucky rep.  ONE timing harness for every datum — the
        scalar-fetch sync pattern (CLAUDE.md invariant) lives here and
        nowhere else."""
        n_epochs = epochs if n_epochs is None else n_epochs
        n_reps = reps if n_reps is None else n_reps
        params = nets.init_net(
            jax.random.PRNGKey(0), kind, ds.num_features, hidden,
            ds.num_classes, layers,
        )
        opt_state = optimizer.init(params)
        step = make_train_step(
            graph, kind, x, y, optimizer, dropout_rate=0.5, hoist=hoist
        )
        key = jax.random.PRNGKey(1)
        # Device-side epoch chunks (train.make_train_step's `many`): the
        # whole rep is ONE execution, so per-dispatch runtime overhead
        # (8+ ms/epoch through the tunnel) stays out of the datum — same
        # loop shape the trainer CLI runs.
        params, opt_state, key, loss = step.many(params, opt_state, key, 10)
        float(loss)  # scalar fetch = true sync (block_until_ready lies here)
        samples, final_loss = [], None
        for _ in range(n_reps):
            t0 = time.perf_counter()
            params, opt_state, key, loss = step.many(
                params, opt_state, key, n_epochs
            )
            final_loss = float(loss)  # forces the epoch chain before the clock stops
            samples.append((time.perf_counter() - t0) * 1e3 / n_epochs)
        samples.sort()
        return samples[len(samples) // 2], final_loss

    # Headline value is measured WITHOUT the layer-1 aggregate hoist so it
    # is like-for-like with the reference schedule (which recomputes that
    # SpMM every epoch); the framework's default (hoisted) epoch is
    # reported alongside.
    epoch_ms, final_loss = measure(hoist=False)
    epoch_ms_hoisted, _ = measure(hoist=True)

    # Driver-captured AGNN datum (4L/h32, the reference's 1_bench_agnn.py
    # configuration) on the same graph — the score-fused attention path.
    # OPTIONAL: a failure here must never take down the required GCN JSON
    # line (the whole point of this file's probe/fallback design).
    agnn_ms = None
    if on_tpu:
        try:
            agnn_best, _ = measure(
                hoist=False, kind="agnn", hidden=32, layers=4,
                n_epochs=50, n_reps=3,
            )
            agnn_ms = round(agnn_best, 4)
        except Exception as e:  # noqa: BLE001 — secondary datum only
            print(f"# agnn datum unavailable ({type(e).__name__}: {e})")

    print(
        json.dumps(
            {
                "metric": "gcn_pubmed_epoch_ms",
                "value": round(epoch_ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / epoch_ms, 3),
                "value_hoisted_default": round(epoch_ms_hoisted, 4),
                "agnn_pubmed_epoch_ms": agnn_ms,
                "prep_ms": round(prep_ms, 1),
                "prep_warm_ms": round(prep_warm_ms, 1),
                "tc_blocks": graph.tc_blocks,
                "backend": jax.default_backend(),
                "final_loss": final_loss,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
