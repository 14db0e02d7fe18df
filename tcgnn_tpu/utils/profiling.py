"""Profiling helpers.

The reference's profiling is external (Nsight Compute invocations +
``proc_prof.py`` CSV averaging, SURVEY.md §5).  The TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler.trace`` (xplane
  dump viewable in TensorBoard/xprof), guarded because tunneled backends
  may not support device tracing;
* :func:`op_stats` — edges/s and effective TFLOP/s from measured wall time,
  the metric contract named in BASELINE.md.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str | None):
    if not log_dir:
        yield
        return
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
        print(f"# profiler trace written to {log_dir}")
    except Exception as e:  # tunneled device plugins may not support tracing
        print(f"# profiler trace unavailable ({type(e).__name__}: {e})")
        yield


# v5e nominal MXU bf16 peak.  This tunneled chip measures ~113 TFLOP/s on
# a plain 8k x 8k XLA matmul; MFU is quoted against the NOMINAL peak so
# numbers are comparable across chips (the reference's ncu SOL metrics are
# likewise against nominal, BASELINE.md kernel-utilization table).
PEAK_BF16_TFLOPS = 197.0


def op_stats(num_edges: int, feature_dim: int, seconds: float) -> dict:
    """Throughput stats for one aggregation pass over the whole graph."""
    edges_per_s = num_edges / seconds if seconds > 0 else float("inf")
    # 2 flops (mul+add) per edge per feature — the *useful* work; the MXU
    # does more on padded tiles, so this is the end-to-end efficiency view.
    tflops = 2.0 * num_edges * feature_dim / seconds / 1e12 if seconds > 0 else 0.0
    return {"edges_per_s": edges_per_s, "useful_tflops": tflops}


def kernel_report(
    num_edges: int,
    exp_edges: int,
    feature_dim: int,
    seconds: float,
    peak_tflops: float = PEAK_BF16_TFLOPS,
) -> dict:
    """Per-kernel utilization: the BASELINE.md metric contract.

    Two rates bracket the kernel:

    * ``useful_tflops`` — 2 * E * d / t: the algorithmic work (what a
      perfect zero-padding sparse engine would count);
    * ``tile_tflops`` / ``mfu_pct`` — 2 * Exp_Edges * d_pad / t against
      the bf16 MXU peak: the dense tile work the kernel actually issues
      (Exp_Edges = TC_Blocks * blk_h * blk_w, the reference's own
      tile-inflation statistic, TCGNN.cpp:225).  The ratio of the two is
      the SGT padding overhead.
    """
    stats = op_stats(num_edges, feature_dim, seconds)
    from tcgnn_tpu.ops.spmm import lane_pad

    d_pad = lane_pad(feature_dim)
    tile_tflops = (
        2.0 * exp_edges * d_pad / seconds / 1e12 if seconds > 0 else 0.0
    )
    stats["tile_tflops"] = tile_tflops
    stats["mfu_pct"] = 100.0 * tile_tflops / peak_tflops
    return stats
