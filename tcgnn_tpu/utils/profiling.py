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


def op_stats(num_edges: int, feature_dim: int, seconds: float) -> dict:
    """Throughput stats for one aggregation pass over the whole graph."""
    edges_per_s = num_edges / seconds if seconds > 0 else float("inf")
    # 2 flops (mul+add) per edge per feature — the *useful* work; the MXU
    # does more on padded tiles, so this is the end-to-end efficiency view.
    tflops = 2.0 * num_edges * feature_dim / seconds / 1e12 if seconds > 0 else 0.0
    return {"edges_per_s": edges_per_s, "useful_tflops": tflops}
