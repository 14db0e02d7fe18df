"""Measured collective traffic of a compiled distributed step.

``partition_stats`` *models* the halo volume from partition metadata;
this module reads what XLA actually emitted: it lowers + compiles a
jitted function and sums the operand/result bytes of every collective in
the optimized HLO, per collective kind.  The two views reconcile in
``tests/test_comm_stats.py`` (measured all-to-all bytes vs the modeled
boundary volume), turning the predicted scaling story into an
instrumented one (round-3 VERDICT #5).

Byte accounting is the *logical* tensor size per collective instance
(the wire algorithm may move more or less — e.g. an all-gather's
bidirectional ring moves (G-1)/G of the output per link); kinds are
reported separately so callers can apply their own wire model.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

# Optimized-HLO instruction kinds we count, mapped to a friendly name.
_COLLECTIVES = {
    "all-to-all": "all_to_all",
    "all-gather": "all_gather",
    "all-reduce": "all_reduce",
    "reduce-scatter": "reduce_scatter",
    "collective-permute": "collective_permute",
}

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of an HLO shape string (tuples summed)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes_from_hlo(
    hlo_text: str, num_devices: int | None = None
) -> Dict[str, Dict[str, int]]:
    """Per-collective-kind {count, bytes} from optimized HLO text.

    Bytes are the RESULT shape of each collective instruction (for
    all-to-all / collective-permute this equals the input; for all-gather
    it is the gathered size; for reduce-scatter the reduced shard).
    ``*-start`` forms (async collectives) are counted once; their
    ``*-done`` halves are skipped.

    ``num_devices``: when given, PARTIAL collective-permutes (the
    quantized halo rounds list only the pairs still owing rows) are
    weighted by their active-pair fraction ``len(source_target_pairs) /
    num_devices`` — the per-device average wire bytes; unlisted links
    move nothing.  Without it every permute counts its full result shape
    (the pre-round accounting).
    """
    out: Dict[str, Dict[str, int]] = {
        v: {"count": 0, "bytes": 0} for v in _COLLECTIVES.values()
    }
    # Instruction definitions are counted ONCE; a collective inside a
    # while-loop body executes once per iteration, so per-step byte totals
    # would under-count.  Detect that case and warn (today's distributed
    # step emits no collectives under while ops; this trips loudly if a
    # future schedule does).
    computation = ""
    in_loop_body = False
    # Defining lines look like "%name = <shape> <op>(operands...)".  The
    # shape may be a long tuple holding "/*index=N*/" comments (which
    # contain '='), so the op is located by searching for "<collective>("
    # after the '=' and the shape is everything between them; operand
    # references ("...(%all-to-all.1), index=0") never have '(' directly
    # after the op substring, so they don't false-positive.
    op_re = re.compile(
        r"\b(all-to-all|all-gather|all-reduce|reduce-scatter|"
        r"collective-permute)(-start|-done)?(\.\d+)?\("
    )
    comp_re = re.compile(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->.*\{")
    for line in hlo_text.splitlines():
        cm = comp_re.match(line)
        if cm:
            computation = cm.group(1)
        eq = line.find("= ")
        if eq < 0:
            continue
        m = op_re.search(line, eq)
        if not m:
            continue
        if m.group(2) == "-done":
            continue
        kind = _COLLECTIVES[m.group(1)]
        shape_text = line[eq + 2 : m.start()]
        if m.group(2) == "-start":
            # Async-start results are (operand, result[, context]) tuples;
            # count only the RESULT element (index 1) so bytes match the
            # sync form instead of double-counting operand + result.
            shapes = _SHAPE_RE.findall(shape_text)
            if len(shapes) >= 2:
                dt, dims = shapes[1]
                shape_text = f"{dt}[{dims}]"
        if "body" in computation or "while" in computation:
            in_loop_body = True
        nbytes = _shape_bytes(shape_text)
        if kind == "collective_permute" and num_devices:
            pm = re.search(
                r"source_target_pairs=\{(\{[^}]*\}(?:,\{[^}]*\})*)\}", line
            )
            if pm:
                npairs = pm.group(1).count("{")
                nbytes = int(round(nbytes * npairs / num_devices))
        out[kind]["count"] += 1
        out[kind]["bytes"] += nbytes
    if in_loop_body:
        import warnings

        warnings.warn(
            "collective emitted inside a while-loop body: per-step byte "
            "totals count instruction DEFINITIONS, so loop-carried "
            "collectives are under-counted (multiply by trip count)",
            stacklevel=2,
        )
        # Uniform value type: flags ride in their own nested dict so
        # consumers iterating the kind entries never hit a bare bool.
        out["_flags"] = {"in_loop_body": 1}
    return out


def dcn_halo_fraction(pair_counts, chips_per_host: int) -> float:
    """Fraction of halo rows crossing a host boundary on a two-level mesh.

    ``pair_counts[s, t]`` = rows shard ``s`` requests from shard ``t``
    (``partition.build_halo``); with :func:`mesh.make_mesh_two_level`'s
    host-major placement, a pair crosses DCN iff
    ``s // chips_per_host != t // chips_per_host``.  Returns 0.0 for an
    empty halo.
    """
    pc = np.asarray(pair_counts, np.int64)
    total = int(pc.sum())
    if total == 0:
        return 0.0
    g = np.arange(pc.shape[0]) // chips_per_host
    cross = pc[g[:, None] != g[None, :]].sum()
    return float(cross) / total


def step_collective_bytes(
    fn, *args, num_devices: int | None = None, **kwargs
) -> Dict[str, Any]:
    """Compile ``fn(*args)`` and report its per-step collective traffic.

    ``fn`` may be a jitted function, a plain function (jitted here), or a
    step from ``make_distributed_train_step`` (its ``.jitted`` /
    ``.bound_args`` hooks are used).  Returns {kind: {count, bytes}} plus
    ``total_bytes``.  The numbers are per executed step (the compiled
    program body), so multiplying by the epoch count gives training
    traffic.  ``num_devices`` (the mesh's total device count) enables
    active-pair weighting of partial collective-permutes — see
    :func:`collective_bytes_from_hlo`.
    """
    import jax

    if hasattr(fn, "jitted"):
        jitted = fn.jitted
        args = args + tuple(fn.bound_args)
    elif hasattr(fn, "lower"):
        jitted = fn
    else:
        jitted = jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    stats = collective_bytes_from_hlo(compiled.as_text(), num_devices)
    stats["total_bytes"] = int(
        np.sum([
            v["bytes"] for k, v in stats.items()
            if not k.startswith("_")
        ])
    )
    return stats
