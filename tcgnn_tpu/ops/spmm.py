"""Pallas MXU SpMM over SGT-tiled graphs (TC-GNN's tensor-core aggregation).

TPU-native re-design of ``spmm_forward_cuda_kernel`` /
``spmmAGNN_forward_cuda_kernel`` (/root/reference/TCGNN_conv/TCGNN_kernel.cu:
336-454, 459-578).  The GPU kernel assigns a thread block per 16-row window,
builds a binary (or attention-weighted) 16x8 A-tile in shared memory from
``edgeToColumn/edgeToRow``, gathers 8 neighbor feature rows, and runs a WMMA
``acc += A @ X_gathered``.

Two TPU formulations live here:

**Dense-tile path (default)** — ``spmm_tc_dense``: the SGT-condensed A-tiles
are materialized ONCE at preprocessing as dense ``[B, blk_h, blk_w]`` int8
blocks (exactly the format whose footprint the reference reports as
``Exp_Edges``, TCGNN.cpp:225) instead of being rebuilt in shared memory on
every launch.  The kernel is then a pure block matmul:

* **condensed gather** — ``Xg = X[col_ids]``: only *unique* neighbors per
  window are gathered (the point of TC-GNN), one XLA gather feeding the
  kernel, cast to bf16 *before* the gather in bf16 mode;
* **grid = (d_tiles, blocks/group)** — each step DMAs a slab of consecutive
  same-window tiles + features and runs MXU matmuls; per-group scalars
  (window, first flag) ride in SMEM via ``PrefetchScalarGridSpec``;
* **output revisiting** — a window's blocks are consecutive, so its output
  tile accumulates in VMEM and spills once per (window, d-tile), like the
  WMMA accumulator's single epilogue store (TCGNN_kernel.cu:453);
* **narrow feature dims stay narrow** — blocks whose last dim equals the
  array dim avoid 128-lane padding traffic for hidden sizes like 16.

**Chunk path (fallback)** — ``spmm_tc``: for graphs whose dense-tile index
space overflows int32 / the memory budget, edges stream through uniform
``edge_chunk`` slots and the A-tile is formed on the fly with one-hot MXU
contractions (a TPU kernel cannot scatter into VMEM the way CUDA scatters
into shared memory):

    gathered = Cᵀ-contract(onehot(c), Xg)   # [EC, D]  pick neighbor rows
    out     += (onehot(r) * w) @ gathered    # [blk_h, D]  scatter-add rows

Padding slots use row sentinel ``blk_h`` whose one-hot is all-zero, so they
contribute nothing (the analogue of zeros in the GPU's shared-mem tile,
TCGNN_kernel.cu:399-408).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcgnn_tpu.config import TileConfig
from tcgnn_tpu.sgt.translate import JaxSGTMeta


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def lane_pad(d: int) -> int:
    """Feature-width padding the dense kernels use: lane-tiled (128) at or
    above one lane, 8-sublane-aligned below — narrow hidden sizes stay
    narrow.  `utils.profiling.kernel_report` derives executed tile work
    from the SAME rule, so MFU tracks what the kernels actually run."""
    return _round_up(d, 128) if d >= 128 else _round_up(max(d, 1), 8)


def default_interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (tests on the CPU mesh)."""
    return jax.default_backend() != "tpu"


def _mxu_precision(compute_dtype):
    """f32 compute must not silently downcast to the MXU's bf16 passes;
    bf16 compute takes the fast path (exact for the 0/1 one-hot operands)."""
    if compute_dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _spmm_kernel(
    # scalar prefetch
    blk_ref, win_ref, first_ref,
    # tensor inputs
    r_ref, c_ref, w_ref, xg_ref,
    # output
    o_ref,
    *,
    blk_h: int,
    blk_w: int,
    weighted: bool,
    compute_dtype,
):
    i = pl.program_id(1)
    ec = r_ref.shape[-1]

    r = r_ref[0]  # [1, EC] int32 (blk_h == padding sentinel)
    c = c_ref[0]  # [1, EC] int32

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (blk_h, ec), 0)
    rmat = (row_iota == r).astype(compute_dtype)  # [blk_h, EC]
    if weighted:
        rmat = rmat * w_ref[0].astype(compute_dtype)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (blk_w, ec), 0)
    cmat_t = (col_iota == c).astype(compute_dtype)  # [blk_w, EC] == Cᵀ

    # gathered[k, d] = Xg[c_k, d]  — contraction over blk_w (dim 0 of both).
    gathered = jax.lax.dot_general(
        cmat_t,
        xg_ref[:].astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype),
    )  # [EC, DT]

    contrib = jnp.dot(
        rmat,
        gathered,
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype),
    )

    @pl.when(first_ref[i] == 1)
    def _():
        o_ref[:] = contrib

    @pl.when(first_ref[i] == 0)
    def _():
        o_ref[:] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_windows", "weighted", "interpret", "d_tile"),
)
def _spmm_padded(
    x: jnp.ndarray,
    col_ids: jnp.ndarray,
    chunk_r: jnp.ndarray,
    chunk_c: jnp.ndarray,
    chunk_w: jnp.ndarray,
    chunk_block: jnp.ndarray,
    chunk_window: jnp.ndarray,
    chunk_first: jnp.ndarray,
    *,
    cfg: TileConfig,
    num_windows: int,
    weighted: bool,
    interpret: bool,
    d_tile: int = 128,
) -> jnp.ndarray:
    """SpMM on D-padded input; returns [num_windows * blk_h, Dpad] f32."""
    n_chunks, ec = chunk_r.shape
    d_pad = x.shape[1]
    assert d_pad % d_tile == 0
    n_dtiles = d_pad // d_tile

    # Condensed neighbor gather (SGT's payoff: unique-only feature reads).
    xg = jnp.take(x, col_ids, axis=0, fill_value=0)  # [B*blk_w, Dpad]

    # Mosaic needs the last two block dims divisible by (8, 128) or equal to
    # the array dims — per-chunk metadata rides as [Cn, 1, EC] with full
    # (1, 1, EC) blocks.
    chunk_r = chunk_r[:, None, :]
    chunk_c = chunk_c[:, None, :]
    chunk_w = chunk_w[:, None, :]

    kernel = functools.partial(
        _spmm_kernel,
        blk_h=cfg.blk_h,
        blk_w=cfg.blk_w,
        weighted=weighted,
        compute_dtype=cfg.compute_dtype,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_dtiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, ec), lambda d, i, blk, win, first: (i, 0, 0)),
            pl.BlockSpec((1, 1, ec), lambda d, i, blk, win, first: (i, 0, 0)),
            pl.BlockSpec((1, 1, ec), lambda d, i, blk, win, first: (i, 0, 0)),
            pl.BlockSpec(
                (cfg.blk_w, d_tile),
                lambda d, i, blk, win, first: (blk[i], d),
            ),
        ],
        out_specs=pl.BlockSpec(
            (cfg.blk_h, d_tile),
            lambda d, i, blk, win, first: (win[i], d),
        ),
    )

    flops = 2 * n_dtiles * n_chunks * ec * d_tile * (cfg.blk_w + cfg.blk_h)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * cfg.blk_h, d_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xg.size * 4 + chunk_r.size * 8 + num_windows * cfg.blk_h * d_pad * 4,
            transcendentals=0,
        ),
    )(
        chunk_block,
        chunk_window,
        chunk_first,
        chunk_r,
        chunk_c,
        chunk_w,
        xg,
    )
    return out


# ---------------------------------------------------------------------------
# Dense-tile path: SGT's condensed A-tiles materialized as dense
# [B, blk_h, blk_w] blocks (the `Exp_Edges` format the reference counts,
# TCGNN.cpp:225) consumed by a pure block-matmul kernel — one MXU op per TC
# block, no per-call one-hot building.  This is the fast path; the chunk
# kernels above remain as the memory-lean fallback for graphs whose dense
# index space exceeds int32 / HBM.
# ---------------------------------------------------------------------------
def build_a_tiles(
    meta: JaxSGTMeta,
    edge_weights: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Materialize dense A-tiles [B, blk_h, blk_w] from SGT edge positions.

    Unweighted tiles are static per graph (built once at preprocessing);
    weighted tiles are a single XLA scatter-add per call (duplicate CSR
    edges sum, matching the chunk kernels' one-hot accumulation).
    """
    cfg = meta.config
    size = meta.num_blocks * cfg.blk_h * cfg.blk_w
    vals = (
        jnp.ones((meta.num_edges,), dtype)
        if edge_weights is None
        else edge_weights.astype(dtype)
    )
    flat = jnp.zeros((size,), dtype).at[meta.edge_pos].add(vals)
    return flat.reshape(meta.num_blocks, cfg.blk_h, cfg.blk_w)


def _spmm_grouped_kernel(
    gwin_ref, gfirst_ref, glast_ref, a_ref, xg_ref, o_ref, acc_ref,
    *, blk_h, blk_w, group, compute_dtype
):
    i = pl.program_id(1)
    acc = jnp.zeros(acc_ref.shape, jnp.float32)
    for k in range(group):
        acc += jnp.dot(
            a_ref[k].astype(compute_dtype),
            xg_ref[k * blk_w : (k + 1) * blk_w, :].astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype),
        )

    # Cross-group accumulation runs in an f32 VMEM scratch; the output ref
    # (compute dtype) is stored once, on the window's last group.  This
    # keeps f32 accumulation exactness while letting bf16 runs write a
    # half-width output stream (the f32 [*, 128]-lane store measured
    # +0.7 ms on DD's BD kernel; same economics here).
    @pl.when(gfirst_ref[i] == 1)
    def _():
        acc_ref[:] = acc

    @pl.when(gfirst_ref[i] == 0)
    def _():
        acc_ref[:] += acc

    @pl.when(glast_ref[i] == 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_windows", "interpret", "d_tile")
)
def _spmm_dense_padded(
    x: jnp.ndarray,
    a_tiles: jnp.ndarray,
    col_ids: jnp.ndarray,
    block_window: jnp.ndarray,
    block_first: jnp.ndarray,
    *,
    cfg: TileConfig,
    num_windows: int,
    interpret: bool,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Block-dense SpMM; returns [num_windows * blk_h, Dpad] f32.

    Grid steps own ``block_group`` *consecutive* blocks of one window (SGT
    pads per-window block counts to the group size) — one large DMA each for
    the tile slab and the gathered features.  A 13k-block graph at one block
    per step is DMA-issue-latency-bound (~1 us/step); grouping amortizes it.
    The window's output tile accumulates in VMEM across its groups via the
    scalar-prefetched (window, first) maps — the WMMA accumulate loop of
    TCGNN_kernel.cu:375-448 at group granularity.
    """
    n_blocks = a_tiles.shape[0]
    d = x.shape[1]
    group = cfg.block_group
    assert n_blocks % group == 0, (n_blocks, group)
    # Narrow feature dims stay narrow: Mosaic accepts a block whose last dim
    # equals the array dim, so a 16-wide hidden layer moves 16 lanes of HBM
    # traffic, not a 128-lane padded stream (8x on the reference's GCN
    # hidden=16 config).  MXU lanes idle, but the op is bandwidth-bound.
    import os
    if d >= d_tile:
        d_pad, d_blk = _round_up(d, d_tile), d_tile
    elif group > 1 and (
        d > 64 or os.environ.get("TCGNN_NARROW_PAD_128") == "1"
    ):
        # Grouped DMAs of a 64<d<128-lane block relayout pathologically
        # (amazon0601 d=96: 14.6 ms vs 5.0 ms padded to 128, measured);
        # full-lane padding is cheaper than the relayout.  Genuinely
        # narrow dims (hidden=16) stay narrow — they group fine.
        d_pad = d_blk = d_tile
    else:
        d_pad = d_blk = _round_up(max(d, 1), 8)
    n_dtiles = d_pad // d_blk

    # Per-group scalars: groups never straddle windows, so the group's
    # window is its first block's, and it initializes the output tile iff
    # its first block is the window's first.  A group is its window's LAST
    # iff the next group starts a new window (scratch flush point).
    gwin = block_window[::group]
    gfirst = block_first[::group]
    glast = jnp.concatenate(
        [gfirst[1:], jnp.ones((1,), gfirst.dtype)]
    )

    # bf16 compute: cast *before* the gather so the random-access traffic is
    # half-width too.  Lane-pad BEFORE the gather as well: gathering
    # unaligned 64<d<128-lane bf16 rows and padding after measured 3x
    # slower than one cheap [N, d]->[N, d_pad] pad followed by an
    # aligned-row gather (amazon0601 d=96 under group=2: 15.4 -> ~5 ms).
    if cfg.compute_dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    xg = jnp.take(x, col_ids, axis=0, fill_value=0)  # [B*blk_w, d_pad]

    kernel = functools.partial(
        _spmm_grouped_kernel,
        blk_h=cfg.blk_h,
        blk_w=cfg.blk_w,
        group=group,
        compute_dtype=cfg.compute_dtype,
    )
    flops = 2 * n_dtiles * n_blocks * cfg.blk_h * cfg.blk_w * d_blk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_dtiles, n_blocks // group),
        in_specs=[
            pl.BlockSpec(
                (group, cfg.blk_h, cfg.blk_w),
                lambda d, b, win, first, last: (b, 0, 0),
            ),
            pl.BlockSpec(
                (group * cfg.blk_w, d_blk),
                lambda d, b, win, first, last: (b, d),
            ),
        ],
        out_specs=pl.BlockSpec(
            (cfg.blk_h, d_blk), lambda d, b, win, first, last: (win[b], d)
        ),
        scratch_shapes=[pltpu.VMEM((cfg.blk_h, d_blk), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_windows * cfg.blk_h, d_pad), cfg.compute_dtype
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xg.size * xg.dtype.itemsize
            + a_tiles.size * a_tiles.dtype.itemsize
            + num_windows * cfg.blk_h * d_pad
            * jnp.dtype(cfg.compute_dtype).itemsize,
            transcendentals=0,
        ),
    )(gwin, gfirst, glast, a_tiles, xg)


def spmm_tc_dense(
    x: jnp.ndarray,
    meta: JaxSGTMeta,
    a_tiles: jnp.ndarray,
    *,
    interpret: bool | None = None,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Tensor-core SpMM via pre-materialized dense A-tiles: ``out = A @ x``."""
    if interpret is None:
        interpret = default_interpret()
    n, d = x.shape
    out = _spmm_dense_padded(
        x,
        a_tiles,
        meta.col_ids,
        meta.block_window,
        meta.block_first_in_window,
        cfg=meta.config,
        num_windows=meta.num_windows,
        interpret=interpret,
        d_tile=d_tile,
    )
    return out[:n, :d]


# ---------------------------------------------------------------------------
# Block-diagonal path (see sgt/blockdiag.py): for banded/component graphs the
# SpMM collapses to a few uniform batched [bin,bin]x[bin,d] matmuls that XLA
# maps straight onto the MXU — no gather, no Pallas grid steps.  Measured 10x
# (diag) / 6.6x (tridiag) over the condensed-gather path on OVCAR-8H.
# ---------------------------------------------------------------------------
# Bin padding granule of the packed block-diagonal tile layout.
BD_BIN_GROUP = 8


@functools.partial(
    jax.jit, static_argnames=("offsets", "cfg", "interpret", "d_tile")
)
def _spmm_bd_core(
    x: jnp.ndarray,
    tiles: jnp.ndarray,  # [Bp, bin, K*bin] packed counts, Bp % BD_BIN_GROUP == 0
    *,
    offsets: tuple,
    cfg: TileConfig,
    interpret: bool,
    d_tile: int = 128,
) -> jnp.ndarray:
    """``out[b] = sum_k D_k[b] @ x[b + k]`` as ONE XLA batched matmul.

    The K diagonal streams collapse into a single [bin, K*bin] x [K*bin, d]
    contraction per bin: the packed tile row multiplies the vertical stack
    of the bin's K shifted feature bins.  The stack is a halo gather
    (x bins are contiguous rows, so the gather moves whole 128-row panels),
    K-times redundant in HBM — measured on DD geometry this still beats a
    hand-rolled Pallas grid ~3x because XLA pipelines the int8 upcast, the
    gather, and the MXU stream (Mosaic pays ~0.7 us fixed cost per small
    dot, swamping d<=128 tiles).  ``interpret`` is accepted for interface
    symmetry; the lowering is plain XLA and runs anywhere.
    """
    del interpret, d_tile
    ct = cfg.compute_dtype
    nbins, bn = tiles.shape[0], tiles.shape[1]
    xs = _bd_stack(x, nbins, bn, offsets, ct)
    out = jnp.einsum(
        "bik,bkd->bid",
        tiles.astype(ct),
        xs,
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(ct),
    )
    return out.reshape(nbins * bn, x.shape[1])


def _bd_stack(x, nbins, bn, offsets, ct):
    """Halo stack ``xs[b] = vstack(x_bin[b+k] for k in offsets)``.

    [nbins, K*bn, d]: the vertical stack of each bin's K shifted feature
    bins — the right operand for every packed-[bn, K*bn]-tile contraction.
    Zero rim bins stand in for wrap-around: a reader of x[b+k] out of range
    multiplies all-zero tiles anyway.  K static slices + stack (plain
    contiguous copies — a slab gather via jnp.take measures ~4x slower).
    """
    n, d = x.shape
    # Normalize the halo range to include 0 so pads/slices stay in-bounds
    # even when every selected offset is one-signed (a strictly upper- or
    # lower-triangular banded graph has no diagonal-0 stream).
    kmin, kmax = min(0, min(offsets)), max(0, max(offsets))
    xb = x.astype(ct)
    xb = jnp.pad(
        xb, ((-kmin * bn, (nbins * bn - n) + kmax * bn), (0, 0))
    ).reshape(nbins + (kmax - kmin), bn, d)
    return jnp.stack(
        [xb[k - kmin:k - kmin + nbins] for k in offsets], axis=1
    ).reshape(nbins, len(offsets) * bn, d)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_edges", "cap", "chunk_bins", "n_chunks", "bn", "offsets", "cfg",
    ),
)
def bd_sddmm_edges(
    xa, xb, pos_pad, e_start, *,
    num_edges, cap, chunk_bins, n_chunks, bn, offsets, cfg,
):
    """Per-edge BD SDDMM: ``e[i] = <xa[row_i], xb[col_i]>`` in CSR order.

    A packed-score formulation (batched score-tile einsum + flat gather,
    round 3's path) computes
    every cell of the [Bp, bn, K*bn] pack — ~100-200x more dot products
    than the E edges need on the biomolecule graphs — and then pays XLA's
    elementwise-gather floor (~0.14 G elem/s measured) to extract them.
    This path computes ONLY the edge dots: a ``fori_loop`` over bin chunks
    where each step row-gathers the chunk's edges' xa/xb rows from
    chunk-LOCAL slices (tens of MB — row gathers from small sources run
    ~3x faster than from the full array, measured 10 ms vs 48 ms for 3.9M
    rows) and reduces their elementwise product.  Per-edge results land at
    ``dynamic_update_slice(out, vals, e_start[ci])``: packed positions are
    non-decreasing in CSR edge order (bin-major pack, row-major edges), so
    each chunk's edges are one contiguous range and a later chunk's write
    overwrites the previous chunk's padding garbage — no compaction gather.

    ``pos_pad`` is the per-edge packed position (monotone; residual edges
    carry their predecessor's position and are overwritten by the caller's
    residual merge), padded by ``cap`` so every chunk can slice a full
    window.  Matches the role of the reference's SDDMM kernel
    (TCGNN_kernel.cu:584-728) — same cost class as its SpMM.
    """
    ct = cfg.compute_dtype
    k = len(offsets)
    kw = k * bn
    d = xa.shape[1]
    bp_pad = n_chunks * chunk_bins
    kmin, kmax = min(0, min(offsets)), max(0, max(offsets))
    n = xa.shape[0]
    xa_p = jnp.pad(xa.astype(ct), ((0, bp_pad * bn - n), (0, 0)))
    xb_p = jnp.pad(
        xb.astype(ct), ((-kmin * bn, (bp_pad * bn - n) + kmax * bn), (0, 0))
    )
    out = jnp.zeros((num_edges + cap,), jnp.float32)

    def step(ci, out):
        b0 = ci * chunk_bins
        xa_c = jax.lax.dynamic_slice_in_dim(
            xa_p, b0 * bn, chunk_bins * bn, 0
        )
        parts = [
            jax.lax.dynamic_slice_in_dim(
                xb_p, (b0 + off - kmin) * bn, chunk_bins * bn, 0
            ).reshape(chunk_bins, bn, d)
            for off in offsets
        ]
        # [CB, K, bn, d] -> flat rows addressed by b_loc*K*bn + j.
        xs_c = jnp.stack(parts, axis=1).reshape(chunk_bins * kw, d)
        es = e_start[ci]
        p = jax.lax.dynamic_slice_in_dim(pos_pad, es, cap, 0)
        r_loc = p // kw - b0 * bn          # packed row within the chunk
        j = p % kw                          # lane within the packed row
        ga = jnp.take(xa_c, r_loc, axis=0, mode="clip")
        gb = jnp.take(xs_c, (r_loc // bn) * kw + j, axis=0, mode="clip")
        # f32 products + f32 accumulation (cast in registers, fused by
        # XLA): matches the condensed SDDMM's precision contract — a bf16
        # product would round each term to 8 mantissa bits first.
        vals = jnp.sum(
            ga.astype(jnp.float32) * gb.astype(jnp.float32), axis=1
        )
        return jax.lax.dynamic_update_slice(out, vals, (es,))

    out = jax.lax.fori_loop(0, n_chunks, step, out)
    return out[:num_edges]


def bd_scatter_weights(w_cov, cov_pack_idx, *, bp, bn, k, dtype):
    """Per-edge weights -> packed [Bp, bn, K*bn] weighted tiles.

    Duplicate edges scatter-add onto the same cell, matching the structural
    pack's duplicate counts (``A_w[i,j] = sum_{e=(i,j)} w_e``).
    """
    flat = jnp.zeros((bp * bn * k * bn,), dtype)
    flat = flat.at[cov_pack_idx].add(w_cov.astype(dtype))
    return flat.reshape(bp, bn, k * bn)


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_windows", "interpret")
)
def _spmm_blockout_padded(
    x, a_tiles, col_ids, block_window, *, cfg, num_windows, interpret,
):
    """Sparse-block SpMM: per-BLOCK output tiles + a window segment-sum.

    The window-condensed Pallas kernel owns one output tile per grid step,
    so a residual graph with ~1 block per window degenerates to one
    DMA-latency-bound step per block (~2.4 us each on DD's 730-block
    residual).  Here every block's [blk_h, d] product is one slice of an
    XLA batched matmul — no scalar maps, no accumulation hazards — and a
    sorted segment-sum folds blocks into their windows.  Profitable exactly
    when num_blocks ~ num_windows and d is small (the block-diagonal
    residual case); block-heavy or wide-d graphs would pay O(nb*blk_h*d)
    f32 for the block outputs and keep the condensed kernel instead.
    """
    del interpret  # plain XLA; accepted for interface symmetry
    ct = cfg.compute_dtype
    nb = a_tiles.shape[0]
    d = x.shape[1]
    xg = jnp.take(x.astype(ct), col_ids, axis=0, fill_value=0)
    blockout = jnp.einsum(
        "bik,bkd->bid",
        a_tiles.astype(ct),
        xg.reshape(nb, cfg.blk_w, d),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(ct),
    )
    out = jax.ops.segment_sum(
        blockout, block_window, num_segments=num_windows,
        indices_are_sorted=True,
    )
    return out.reshape(num_windows * cfg.blk_h, d)


def spmm_tc_blockout(
    x: jnp.ndarray,
    meta: JaxSGTMeta,
    a_tiles: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Block-output SpMM for near-uniform block/window layouts (residuals)."""
    if interpret is None:
        interpret = default_interpret()
    n, d = x.shape
    out = _spmm_blockout_padded(
        x, a_tiles, meta.col_ids, meta.block_window,
        cfg=meta.config, num_windows=meta.num_windows, interpret=interpret,
    )
    return out[:n, :d]


@functools.partial(
    jax.jit, static_argnames=("padded_blocks", "blk_h", "blk_w", "out_dtype")
)
def _build_struct_tiles_padded(
    edge_pos, *, padded_blocks, blk_h, blk_w, out_dtype=None
):
    flat = jnp.zeros((padded_blocks * blk_h * blk_w,), jnp.int32)
    # padding slots carry an out-of-range sentinel; drop them explicitly
    flat = flat.at[edge_pos].add(1, mode="drop")
    tiles = flat.reshape(padded_blocks, blk_h, blk_w)
    if out_dtype is not None:
        # Storage dtype decided host-side (duplicate-count max is known from
        # the translate pass) — the cast rides the scatter program, so prep
        # dispatches ONE device program and never syncs on a value.
        return tiles.astype(out_dtype)
    return tiles, jnp.max(tiles)


def build_struct_tiles(edge_pos, *, num_blocks, blk_h, blk_w, out_dtype=None):
    """Structural A-tiles [B, blk_h, blk_w] from per-edge flat positions.

    Runs ON DEVICE: the host ships ``edge_pos`` (4 bytes/edge — needed by
    the weighted paths anyway) instead of the materialized dense tile
    array (``blk_h*blk_w`` bytes per block; amazon0601: 460 MB through the
    slow tunnel).  With ``out_dtype`` set, the storage cast is fused into
    the scatter program and only the tile array is returned — the caller
    decides int8-exactness host-side (``sgt/translate.py`` overflow rule)
    and nothing forces a device sync.  Without it, returns int32 counts
    plus their max for callers that must probe on device.

    The scatter compiles per INPUT+OUTPUT SHAPE and a remote compile
    costs seconds through the tunnel, so BOTH dimensions are bucketed to
    the next power of two (edge padding carries an out-of-range sentinel
    the scatter drops; ≤2x transient HBM on the block side) and the
    result sliced back — every graph in a sweep, and every run through
    the persistent compile cache, shares a handful of compilations.
    """
    cap = (2**31 - 1) // (blk_h * blk_w)  # edge_pos is int32 (translate.py)
    padded = 1 << max(8, (num_blocks - 1).bit_length())
    if padded > cap:
        padded = min(cap, -(-num_blocks // 1024) * 1024)
    e = edge_pos.shape[0]
    e_bucket = 1 << max(12, (e - 1).bit_length())
    if e_bucket != e:
        sentinel = padded * blk_h * blk_w  # out of range -> dropped
        edge_pos = jnp.pad(edge_pos, (0, e_bucket - e), constant_values=sentinel)
    out = _build_struct_tiles_padded(
        edge_pos, padded_blocks=padded, blk_h=blk_h, blk_w=blk_w,
        out_dtype=out_dtype,
    )
    if out_dtype is not None:
        return out[:num_blocks]
    tiles, mx = out
    return tiles[:num_blocks], mx


# ---------------------------------------------------------------------------
# Window-segment streamed chunk path (sgt/stream.py): lax.scan ONE compiled
# chunk kernel over S stacked uniform segments.  Per-step SMEM holds C_max
# prefetched chunks and the per-step condensed slab holds B_max*blk_w rows —
# both bounded by construction — so graphs whose one-shot chunk metadata
# overflows SMEM (Reddit: 172k+ chunks) or whose condensed slab overflows
# HBM still run with the full feature matrix (only O(N*D)) resident.
# ---------------------------------------------------------------------------
@functools.partial(
    jax.jit,
    static_argnames=("cfg", "wseg", "weighted", "interpret", "d_tile"),
)
def _spmm_streamed_padded(
    x: jnp.ndarray,
    w_tbl: jnp.ndarray,
    seg_col_ids: jnp.ndarray,
    seg_r: jnp.ndarray,
    seg_c: jnp.ndarray,
    seg_edge_id: jnp.ndarray,
    seg_block: jnp.ndarray,
    seg_window: jnp.ndarray,
    seg_first: jnp.ndarray,
    *,
    cfg: TileConfig,
    wseg: int,
    weighted: bool,
    interpret: bool,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Streamed chunk SpMM; returns [S * wseg * blk_h, Dpad] f32.

    Each scan step is exactly one `_spmm_padded` segment call: the
    segment's condensed gather + chunk kernel, with segment-relative
    window ids so the output tile space is the segment's own
    [wseg * blk_h, Dpad] slab.  Per-chunk edge weights are gathered from
    ``w_tbl`` (num_edges + 1 entries; the sentinel reads the appended
    zero) inside the step so no [Cn, EC] weight array is ever resident.
    """
    num_segments = seg_r.shape[0]

    def step(_, seg):
        col_ids, r, c, eid, blk, win, first = seg
        cw = w_tbl[eid] if weighted else jnp.zeros(r.shape, jnp.float32)
        out_s = _spmm_padded(
            x, col_ids, r, c, cw, blk, win, first,
            cfg=cfg, num_windows=wseg, weighted=weighted,
            interpret=interpret, d_tile=d_tile,
        )
        return None, out_s

    _, outs = jax.lax.scan(
        step,
        None,
        (seg_col_ids, seg_r, seg_c, seg_edge_id, seg_block, seg_window,
         seg_first),
    )
    return outs.reshape(num_segments * wseg * cfg.blk_h, x.shape[1])


def spmm_tc_streamed(
    x: jnp.ndarray,
    smeta,
    edge_weights: jnp.ndarray | None = None,
    *,
    interpret: bool | None = None,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Streamed tensor-core SpMM: ``out = A @ x`` over window segments.

    ``smeta`` is a :class:`tcgnn_tpu.sgt.stream.StreamedJaxMeta`.  Same
    semantics as :func:`spmm_tc` (TCGNN_kernel.cu:336-454 /459-578), for
    graphs past the one-shot chunk kernels' SMEM/HBM ceilings.
    """
    if interpret is None:
        interpret = default_interpret()
    cfg = smeta.config
    n, d = x.shape
    d_pad = _round_up(max(d, 1), d_tile)
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    if edge_weights is None:
        weighted = False
        w_tbl = jnp.zeros((1,), jnp.float32)
    else:
        weighted = True
        w_tbl = jnp.concatenate(
            [edge_weights.astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
        )
    out = _spmm_streamed_padded(
        x, w_tbl,
        smeta.seg_col_ids, smeta.seg_r, smeta.seg_c, smeta.seg_edge_id,
        smeta.seg_block, smeta.seg_window, smeta.seg_first,
        cfg=cfg, wseg=smeta.wseg, weighted=weighted,
        interpret=interpret, d_tile=d_tile,
    )
    return out[:n, :d]


@functools.partial(jax.jit, static_argnames=("k", "nbins", "bn"))
def build_bd_pack(tile_idx, tile_cnt, *, k, nbins, bn) -> jnp.ndarray:
    """Sparse (idx, cnt) tile contents -> the kernel's [Bp, bin, K*bin] pack.

    Runs ON DEVICE: the host ships only the nonzero entries (~bytes per
    edge) instead of materializing, transposing, and uploading the full
    mostly-zero pack (DD: 340 MB, ~28 s through the tunnel + 7 s of host
    copies).  ``Bp`` is B rounded up to ``BD_BIN_GROUP`` (padding bins are
    all-zero, so they contribute nothing and their outputs are sliced
    away).
    """
    flat = jnp.zeros((k * nbins * bn * bn,), tile_cnt.dtype)
    flat = flat.at[tile_idx].set(tile_cnt, indices_are_sorted=True,
                                 unique_indices=True)
    packed = (
        flat.reshape(k, nbins, bn, bn)
        .transpose(1, 2, 0, 3)
        .reshape(nbins, bn, k * bn)
    )
    bp = _round_up(max(nbins, 1), BD_BIN_GROUP)
    if bp != nbins:
        packed = jnp.pad(packed, ((0, bp - nbins), (0, 0), (0, 0)))
    return packed


def _bd_plain_kernel(t_ref, r0, r1, r2, o_ref, *, bn, group, offsets,
                     compute_dtype):
    """Unfused BD SpMM grid step: ``out[g] = tiles[g] @ concat(x bins)``.

    The ``_bd_sfused_kernel`` DMA pattern minus the score matmuls: the
    int8 pack is upcast in VMEM (the XLA einsum path materializes a bf16
    copy of the whole pack in HBM — 430 MB on DD) and the K-shifted
    feature stack is concatenated from three contiguous panels in VMEM
    (the einsum path writes the [Bp, K*bn, d] halo stack to HBM — 322 MB
    on DD, read back once more).  Measured on DD dim 96: 6.1 ms (einsum)
    -> 2.6 ms here.
    """
    prec = _mxu_precision(compute_dtype)
    slab = jnp.concatenate([r0[:], r1[:], r2[:]], axis=0)  # [3*G*bn, d]
    for g in range(group):
        xs = jnp.concatenate(
            [
                slab[(group + g + k) * bn : (group + g + k + 1) * bn]
                for k in offsets
            ],
            axis=0,
        ).astype(compute_dtype)  # [K*bn, d]
        o_ref[g * bn : (g + 1) * bn] = jnp.dot(
            t_ref[g].astype(compute_dtype), xs,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "cfg", "interpret")
)
def _spmm_bd_pallas(x, tiles, *, offsets, cfg, interpret):
    bp, bn = tiles.shape[0], tiles.shape[1]
    k = len(offsets)
    g = BD_BIN_GROUP
    ct = cfg.compute_dtype
    d = x.shape[1]
    d_pad = lane_pad(d)
    p = g * bn
    xp = jnp.pad(
        x.astype(ct), ((p, (bp + g) * bn - x.shape[0]), (0, d_pad - d))
    )
    panel = lambda off: pl.BlockSpec(
        (p, d_pad), lambda i, _off=off: (i + _off, 0)
    )
    kernel = functools.partial(
        _bd_plain_kernel, bn=bn, group=g, offsets=offsets, compute_dtype=ct,
    )
    # Output in compute dtype: the dot accumulates f32 on the MXU and only
    # the STORE rounds; every training consumer casts the aggregate to the
    # compute dtype for its next matmul anyway, while an f32 store is a
    # [N, 128]-lane-padded write that measured +0.7 ms on DD (d=16 layers
    # pay the full 128-lane f32 write either way).
    return pl.pallas_call(
        kernel,
        grid=(bp // g,),
        in_specs=[
            pl.BlockSpec((g, bn, k * bn), lambda i: (i, 0, 0)),
            panel(0), panel(1), panel(2),
        ],
        out_specs=pl.BlockSpec((p, d_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp * bn, d_pad), ct),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * bn * k * bn * d_pad,
            bytes_accessed=tiles.size * tiles.dtype.itemsize
            + 3 * bp * bn * d_pad * xp.dtype.itemsize
            + bp * bn * d_pad * jnp.dtype(ct).itemsize,
            transcendentals=0,
        ),
    )(tiles, xp, xp, xp)


def spmm_block_diag(
    x: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    offsets: tuple,
    cfg: TileConfig,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Block-diagonal SpMM: ``out = A_bd @ x`` (covered offsets only).

    ``tiles`` is the packed [B, bin, K*bin] layout (``build_bd_pack``).
    The caller adds the residual-edge contribution (condensed-gather path)
    when coverage < 1; see ``TiledGraph._make_ops``.  Uses the panel-DMA
    Pallas kernel when the halo fits the bin group (always true for packs
    built through ``TiledGraph`` — the BD gate requires it); the XLA
    einsum form is the fallback for wider custom offset sets.
    """
    if interpret is None:
        interpret = default_interpret()
    if max(abs(o) for o in offsets) <= BD_BIN_GROUP:
        return _spmm_bd_pallas(
            x, tiles, offsets=offsets, cfg=cfg, interpret=interpret
        )[: x.shape[0], : x.shape[1]]
    return _spmm_bd_core(
        x, tiles, offsets=offsets, cfg=cfg, interpret=interpret
    )[: x.shape[0], : x.shape[1]]


# ---------------------------------------------------------------------------
# Score-fused BLOCK-DIAGONAL kernel: the packed-diagonal counterpart of
# `_spmm_sfused_padded` —
#
#     out_bin[b] = sum_k (C_k[b] ⊙ (xl_bin[b] @ xr_bin[b+k]ᵀ)) @ xv_bin[b+k]
#
# with the per-bin score tiles formed IN VMEM.  The previous BD fused path
# materialized [Bp, bn, K*bn] score/weighted packs in HBM per term (YeastH:
# 2.4 GB bf16 each, several per backward); here the only HBM traffic is the
# int8 structural pack plus contiguous feature panels.  Grid steps own
# BD_BIN_GROUP bins; the halo (|offset| <= BD_BIN_GROUP, checked by the
# caller) is covered by reading THREE consecutive feature panels per step —
# plain contiguous DMAs, no gather anywhere.
# ---------------------------------------------------------------------------
def _bd_sfused_kernel(
    c_ref, *refs, bn, group, offsets, compute_dtype, l_from, v_from,
):
    refs = list(refs)
    o_ref = refs.pop()
    l_ref = refs.pop(0) if l_from == "own" else None
    r0, r1, r2 = refs[:3]
    prec = _mxu_precision(compute_dtype)
    slab_r = jnp.concatenate([r0[:], r1[:], r2[:]], axis=0)  # [3*G*bn, d]
    if v_from == "own":
        v0, v1, v2 = refs[3:6]
        slab_v = jnp.concatenate([v0[:], v1[:], v2[:]], axis=0)
    else:
        slab_v = slab_r
    p = group * bn
    if l_from == "r":
        xl = slab_r[p : 2 * p]
    elif l_from == "v":
        xl = slab_v[p : 2 * p]
    else:
        xl = l_ref[:]
    for g in range(group):
        xlg = xl[g * bn : (g + 1) * bn].astype(compute_dtype)  # [bn, d]
        xs = jnp.concatenate(
            [
                slab_r[(group + g + k) * bn : (group + g + k + 1) * bn]
                for k in offsets
            ],
            axis=0,
        ).astype(compute_dtype)  # [K*bn, d]
        s = jax.lax.dot_general(
            xlg, xs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [bn, K*bn] — BD score tile, VMEM-only
        w = c_ref[g].astype(compute_dtype) * s.astype(compute_dtype)
        if v_from == "r":
            vs = xs
        else:
            vs = jnp.concatenate(
                [
                    slab_v[(group + g + k) * bn : (group + g + k + 1) * bn]
                    for k in offsets
                ],
                axis=0,
            ).astype(compute_dtype)
        o_ref[g * bn : (g + 1) * bn] = jnp.dot(
            w, vs, preferred_element_type=jnp.float32, precision=prec
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "cfg", "interpret", "l_from", "v_from"),
)
def _bd_sfused_padded(
    xl, xr, xv, tiles,
    *, offsets, cfg, interpret, l_from, v_from,
):
    bp, bn = tiles.shape[0], tiles.shape[1]
    k = len(offsets)
    g = BD_BIN_GROUP
    assert bp % g == 0, (bp, g)
    assert max(abs(o) for o in offsets) <= g, offsets
    ct = cfg.compute_dtype
    d = xr.shape[1]
    d_pad = lane_pad(d)
    p = g * bn

    def panelize(x):
        return jnp.pad(
            x.astype(ct),
            ((p, (bp + g) * bn - x.shape[0]), (0, d_pad - d)),
        )

    xp_r = panelize(xr)
    panel = lambda off: pl.BlockSpec(
        (p, d_pad), lambda i, _off=off: (i + _off, 0)
    )
    in_specs = [
        pl.BlockSpec((g, bn, k * bn), lambda i: (i, 0, 0)),
        panel(0), panel(1), panel(2),
    ]
    # The r slab is one array read through three shifted panel specs.
    operands = [tiles, xp_r, xp_r, xp_r]
    if v_from == "own":
        xp_v = panelize(xv)
        operands += [xp_v, xp_v, xp_v]
        in_specs += [panel(0), panel(1), panel(2)]
    if l_from == "own":
        operands.insert(1, panelize(xl))
        in_specs.insert(1, panel(1))

    kernel = functools.partial(
        _bd_sfused_kernel, bn=bn, group=g, offsets=offsets,
        compute_dtype=ct, l_from=l_from, v_from=v_from,
    )
    return pl.pallas_call(
        kernel,
        grid=(bp // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((p, d_pad), lambda i: (i, 0)),
        # Compute-dtype store (f32 MXU accumulate; only the store rounds):
        # each grid step owns its output block, so no cross-step
        # accumulation dtype is involved.  Under bf16 this halves the
        # biggest write stream of the AGNN epoch (YeastH: 1.6 GB f32 out
        # per fused pass).
        out_shape=jax.ShapeDtypeStruct((bp * bn, d_pad), ct),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * bn * k * bn * d_pad,
            bytes_accessed=tiles.size * tiles.dtype.itemsize
            + 5 * bp * bn * d_pad * xp_r.dtype.itemsize
            + bp * bn * d_pad * jnp.dtype(ct).itemsize,
            transcendentals=0,
        ),
    )(*operands)


def bd_sfused(
    xl: jnp.ndarray,
    xr: jnp.ndarray,
    xv: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    offsets: tuple,
    cfg: TileConfig,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Score-fused block-diagonal SpMM:
    ``out = (C ⊙ S) @ xv`` with ``S(i, j) = <xl[i], xr[j]>`` restricted to
    the packed diagonal tiles.  Operand *object identity* (``xl is xr``
    etc.) selects the panel-sharing layout — pass the same array object to
    share its DMA streams.
    """
    if interpret is None:
        interpret = default_interpret()
    l_from = "r" if xl is xr else ("v" if xl is xv else "own")
    v_from = "r" if xv is xr else "own"
    n, d = xl.shape
    out = _bd_sfused_padded(
        None if l_from != "own" else xl,
        xr,
        None if v_from != "own" else xv,
        tiles,
        offsets=offsets, cfg=cfg, interpret=interpret,
        l_from=l_from, v_from=v_from,
    )
    return out[:n, :d]


# ---------------------------------------------------------------------------
# Fused 3-term AGNN BACKWARD, block-diagonal space: one pass computes
#
#     dx3 = (C⊙S)@dy + (C⊙T)@x + (C⊙U)@x      and      u = (C⊙S)@x
#
# with S = x@xᵀ, T = dy@xᵀ, U = x@dyᵀ restricted to the packed diagonals.
# Running the three dx terms as separate `bd_sfused` passes re-reads the
# slabs 5× and makes XLA materialize a distinct lane-padded copy of x/dy
# per call (the YeastH f32 step OOM'd HBM on exactly those pads); fused,
# each slab is read once and (T+U) shares a value matmul — 6 matmuls per
# tile for all four terms.  `u` costs one of those matmuls and frees the
# forward from saving any residual: d attention = <dy, u> is recovered
# here instead.
# ---------------------------------------------------------------------------
def _bd_sfused_bwd_kernel(
    c_ref, x0, x1, x2, y0, y1, y2, dx_ref, u_ref,
    *, bn, group, offsets, compute_dtype,
):
    prec = _mxu_precision(compute_dtype)
    ct = compute_dtype
    slab_x = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)  # [3*G*bn, d]
    slab_y = jnp.concatenate([y0[:], y1[:], y2[:]], axis=0)
    dn = (((1,), (1,)), ((), ()))
    for g in range(group):
        base = (group + g) * bn
        xw = slab_x[base : base + bn].astype(ct)
        dyw = slab_y[base : base + bn].astype(ct)
        xs = jnp.concatenate(
            [slab_x[base + k * bn : base + (k + 1) * bn] for k in offsets],
            axis=0,
        ).astype(ct)  # [K*bn, d]
        dys = jnp.concatenate(
            [slab_y[base + k * bn : base + (k + 1) * bn] for k in offsets],
            axis=0,
        ).astype(ct)
        s = jax.lax.dot_general(
            xw, xs, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        t = jax.lax.dot_general(
            dyw, xs, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        w2 = jax.lax.dot_general(
            xw, dys, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        c = c_ref[g].astype(ct)
        cs = c * s.astype(ct)
        dx_ref[g * bn : (g + 1) * bn] = (
            jnp.dot(
                cs, dys, preferred_element_type=jnp.float32, precision=prec
            )
            + jnp.dot(
                c * (t + w2).astype(ct), xs,
                preferred_element_type=jnp.float32, precision=prec,
            )
        ).astype(dx_ref.dtype)
        u_ref[g * bn : (g + 1) * bn] = jnp.dot(
            cs, xs, preferred_element_type=jnp.float32, precision=prec
        ).astype(u_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "cfg", "interpret")
)
def _bd_sfused_bwd_padded(x, dy, tiles, *, offsets, cfg, interpret):
    bp, bn = tiles.shape[0], tiles.shape[1]
    k = len(offsets)
    g = BD_BIN_GROUP
    assert bp % g == 0, (bp, g)
    assert max(abs(o) for o in offsets) <= g, offsets
    ct = cfg.compute_dtype
    d = x.shape[1]
    d_pad = lane_pad(d)
    p = g * bn

    def panelize(a):
        return jnp.pad(
            a.astype(ct), ((p, (bp + g) * bn - a.shape[0]), (0, d_pad - d))
        )

    xp = panelize(x)
    yp = panelize(dy)
    panel = lambda off: pl.BlockSpec(
        (p, d_pad), lambda i, _off=off: (i + _off, 0)
    )
    kernel = functools.partial(
        _bd_sfused_bwd_kernel, bn=bn, group=g, offsets=offsets,
        compute_dtype=ct,
    )
    # Compute-dtype stores; see _bd_sfused_padded.  dx/u are consumed by
    # f32-promoting math (cbar scaling, an f32 vdot), so only the HBM
    # stream narrows.
    out_sds = jax.ShapeDtypeStruct((bp * bn, d_pad), ct)
    return pl.pallas_call(
        kernel,
        grid=(bp // g,),
        in_specs=[
            pl.BlockSpec((g, bn, k * bn), lambda i: (i, 0, 0)),
            panel(0), panel(1), panel(2),
            panel(0), panel(1), panel(2),
        ],
        out_specs=[
            pl.BlockSpec((p, d_pad), lambda i: (i, 0)),
            pl.BlockSpec((p, d_pad), lambda i: (i, 0)),
        ],
        out_shape=[out_sds, out_sds],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * bp * bn * k * bn * d_pad,
            bytes_accessed=tiles.size * tiles.dtype.itemsize
            + 6 * bp * bn * d_pad * xp.dtype.itemsize
            + 2 * bp * bn * d_pad * jnp.dtype(ct).itemsize,
            transcendentals=0,
        ),
    )(tiles, xp, xp, xp, yp, yp, yp)


def bd_sfused_bwd(
    x: jnp.ndarray,
    dy: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    offsets: tuple,
    cfg: TileConfig,
    interpret: bool | None = None,
):
    """Fused AGNN backward over packed diagonal tiles.

    Returns ``(dx3, u)`` with ``dx3 = (C⊙S)@dy + (C⊙T)@x + (C⊙U)@x`` and
    ``u = (C⊙S)@x`` (the forward product, for the attention gradient) —
    see `_bd_sfused_bwd_kernel`.
    """
    if interpret is None:
        interpret = default_interpret()
    n, d = x.shape
    dx3, u = _bd_sfused_bwd_padded(
        x, dy, tiles, offsets=offsets, cfg=cfg, interpret=interpret
    )
    return dx3[:n, :d], u[:n, :d]


# ---------------------------------------------------------------------------
# Fused score-weighted kernels (the AGNN tile-space path): the weighted
# A-tile is formed IN-KERNEL as  struct_tile * score_tile  — never
# materialized in HBM.  Score tiles come straight from the dense SDDMM;
# structural int8 tiles mask their non-edge garbage.
# ---------------------------------------------------------------------------
def _spmm_fused_kernel(
    gwin_ref, gfirst_ref, a_ref, s_ref, xg_ref, o_ref, *, blk_h, blk_w, group, compute_dtype
):
    i = pl.program_id(1)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for k in range(group):
        w = a_ref[k].astype(compute_dtype) * s_ref[k].astype(compute_dtype)
        acc += jnp.dot(
            w,
            xg_ref[k * blk_w : (k + 1) * blk_w, :].astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype),
        )

    @pl.when(gfirst_ref[i] == 1)
    def _():
        o_ref[:] = acc

    @pl.when(gfirst_ref[i] == 0)
    def _():
        o_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_windows", "interpret", "d_tile")
)
def _spmm_fused_padded(
    x, a_tiles, s_tiles, col_ids, block_window, block_first,
    *, cfg, num_windows, interpret, d_tile=128,
):
    """Score-weighted SpMM: out = (A_struct * S) @ x, [W*blk_h, Dpad] f32."""
    n_blocks = a_tiles.shape[0]
    d = x.shape[1]
    group = cfg.block_group
    assert n_blocks % group == 0, (n_blocks, group)
    if d >= d_tile:
        d_pad, d_blk = _round_up(d, d_tile), d_tile
    elif group > 1 and d > 64:
        # Grouped DMAs of a 64<d<128-lane block relayout pathologically
        # (amazon0601 d=96: 14.6 ms vs 5.0 ms padded to 128, measured);
        # full-lane padding is cheaper than the relayout.  Genuinely
        # narrow dims (hidden=16) stay narrow — they group fine.
        d_pad = d_blk = d_tile
    else:
        d_pad = d_blk = _round_up(max(d, 1), 8)
    n_dtiles = d_pad // d_blk
    gwin = block_window[::group]
    gfirst = block_first[::group]
    if cfg.compute_dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    xg = jnp.take(x, col_ids, axis=0, fill_value=0)
    if d_pad != d:
        xg = jnp.pad(xg, ((0, 0), (0, d_pad - d)))

    kernel = functools.partial(
        _spmm_fused_kernel, blk_h=cfg.blk_h, blk_w=cfg.blk_w,
        group=group, compute_dtype=cfg.compute_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_dtiles, n_blocks // group),
        in_specs=[
            pl.BlockSpec((group, cfg.blk_h, cfg.blk_w), lambda d, b, w_, f_: (b, 0, 0)),
            pl.BlockSpec((group, cfg.blk_h, cfg.blk_w), lambda d, b, w_, f_: (b, 0, 0)),
            pl.BlockSpec((group * cfg.blk_w, d_blk), lambda d, b, w_, f_: (b, d)),
        ],
        out_specs=pl.BlockSpec(
            (cfg.blk_h, d_blk), lambda d, b, w_, f_: (w_[b], d)
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * cfg.blk_h, d_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_dtiles * n_blocks * cfg.blk_h * cfg.blk_w * d_blk,
            bytes_accessed=xg.size * xg.dtype.itemsize
            + a_tiles.size + s_tiles.size * s_tiles.dtype.itemsize
            + num_windows * cfg.blk_h * d_pad * 4,
            transcendentals=0,
        ),
    )(gwin, gfirst, a_tiles, s_tiles, xg)


# ---------------------------------------------------------------------------
# Score-fused kernels (the round-3 AGNN fast path): the generalized product
#
#     out = (A_struct ⊙ (Xl @ Xr_gᵀ)) @ Xv_g
#
# with the score tile  S_b = Xl[window(b)] @ Xr_g[b]ᵀ  formed IN VMEM per
# grid step — score tiles never exist in HBM (the previous fused path
# materialized [B, blk_h, blk_w] score arrays per pass: ~1 GB on the
# amazon-class graphs, ~2.4 GB packs on YeastH, read+written every term).
#
# Every AGNN train-step term is an instance (graph symmetric, S = X Xᵀ):
#   forward   u   = (A ⊙ (x @ xᵀ))  @ x          l=x,  r=x,  v=x
#   backward  t1  = (A ⊙ (x @ xᵀ))  @ dy         l=x,  r=x,  v=dy
#             t2a = (A ⊙ (dy @ xᵀ)) @ x          l=dy, r=x,  v=x
#             t2b = (A ⊙ (dy @ xᵀ))ᵀ @ x
#                 = (A ⊙ (x @ dyᵀ)) @ x          l=x,  r=dy, v=x
# using (M ⊙ T)ᵀ = Mᵀ ⊙ Tᵀ and A = Aᵀ — so the transpose/column-space
# kernel disappears from the backward entirely.
# Reference counterpart: the AGNN kernel pair TCGNN_kernel.cu:459-578 +
# 584-728 (same cost class as the GCN SpMM, which this restores on TPU).
# ---------------------------------------------------------------------------
def _spmm_sfused_kernel(
    gwin_ref, gfirst_ref, a_ref, xl_ref, xr_ref, *rest,
    blk_h, blk_w, group, compute_dtype, share_rv,
):
    if share_rv:
        xv_ref, o_ref = None, rest[0]
    else:
        xv_ref, o_ref = rest
    i = pl.program_id(0)
    prec = _mxu_precision(compute_dtype)
    xl = xl_ref[:].astype(compute_dtype)  # [blk_h, d] — the group's window
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for k in range(group):
        xr_k = xr_ref[k * blk_w : (k + 1) * blk_w, :].astype(compute_dtype)
        s = jax.lax.dot_general(
            xl, xr_k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [blk_h, blk_w] — the score tile, VMEM-only
        w = a_ref[k].astype(compute_dtype) * s.astype(compute_dtype)
        xv_k = (
            xr_k
            if share_rv
            else xv_ref[k * blk_w : (k + 1) * blk_w, :].astype(compute_dtype)
        )
        acc += jnp.dot(
            w, xv_k, preferred_element_type=jnp.float32, precision=prec
        )

    @pl.when(gfirst_ref[i] == 1)
    def _():
        o_ref[:] = acc

    @pl.when(gfirst_ref[i] == 0)
    def _():
        o_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_windows", "interpret")
)
def _spmm_sfused_padded(
    xl, xr, xv, a_tiles, col_ids, block_window, block_first,
    *, cfg, num_windows, interpret,
):
    """Score-fused SpMM: out = (A ⊙ (xl @ xr_gᵀ)) @ xv_g, [W*blk_h, Dpad] f32.

    ``xv=None`` shares the gathered xr slab as the value operand (the
    forward/t2a cases), halving the gathered-feature DMA.  No d-tiling:
    the score contraction needs the operands' full feature width per step
    (AGNN aggregates at hidden width, d ≤ 128-class; VMEM holds it easily).
    """
    n_blocks = a_tiles.shape[0]
    d = xl.shape[1]
    group = cfg.block_group
    assert n_blocks % group == 0, (n_blocks, group)
    d_pad = lane_pad(d)
    gwin = block_window[::group]
    gfirst = block_first[::group]

    share_rv = xv is None
    if cfg.compute_dtype == jnp.bfloat16:
        xl = xl.astype(jnp.bfloat16)
        xr = xr.astype(jnp.bfloat16)
        xv = None if share_rv else xv.astype(jnp.bfloat16)
    # Window source may EXCEED the window span (distributed extended slabs:
    # local rows first, halo tail after) — trim before padding.
    xl = xl[: num_windows * cfg.blk_h]
    xl_pad = jnp.pad(
        xl, ((0, num_windows * cfg.blk_h - xl.shape[0]), (0, d_pad - d))
    )
    xr_g = jnp.take(xr, col_ids, axis=0, fill_value=0)
    if d_pad != d:
        xr_g = jnp.pad(xr_g, ((0, 0), (0, d_pad - d)))
    operands = [gwin, gfirst, a_tiles, xl_pad, xr_g]
    in_specs = [
        pl.BlockSpec((group, cfg.blk_h, cfg.blk_w), lambda b, w_, f_: (b, 0, 0)),
        pl.BlockSpec((cfg.blk_h, d_pad), lambda b, w_, f_: (w_[b], 0)),
        pl.BlockSpec((group * cfg.blk_w, d_pad), lambda b, w_, f_: (b, 0)),
    ]
    if not share_rv:
        xv_g = jnp.take(xv, col_ids, axis=0, fill_value=0)
        if d_pad != d:
            xv_g = jnp.pad(xv_g, ((0, 0), (0, d_pad - d)))
        operands.append(xv_g)
        in_specs.append(
            pl.BlockSpec((group * cfg.blk_w, d_pad), lambda b, w_, f_: (b, 0))
        )

    kernel = functools.partial(
        _spmm_sfused_kernel, blk_h=cfg.blk_h, blk_w=cfg.blk_w,
        group=group, compute_dtype=cfg.compute_dtype, share_rv=share_rv,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (cfg.blk_h, d_pad), lambda b, w_, f_: (w_[b], 0)
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_windows * cfg.blk_h, d_pad), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_blocks * cfg.blk_h * cfg.blk_w * d_pad,
            bytes_accessed=xr_g.size * xr_g.dtype.itemsize * (1 if share_rv else 2)
            + n_blocks * cfg.blk_h * xl_pad.dtype.itemsize * d_pad
            + a_tiles.size * a_tiles.dtype.itemsize
            + num_windows * cfg.blk_h * d_pad * 4,
            transcendentals=0,
        ),
    )(*operands)


def spmm_sfused(
    xl: jnp.ndarray,
    xr: jnp.ndarray,
    xv: jnp.ndarray,
    meta: JaxSGTMeta,
    a_tiles: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Score-fused SpMM over SGT condensed tiles:
    ``out = (A ⊙ (xl @ xvᵀ-space scores)) @ xv`` with
    ``score(i, j) = <xl[i], xr[j]>`` — see `_spmm_sfused_padded`.

    Pass ``xv is xr`` (object identity) to share the gathered slab.
    """
    if interpret is None:
        interpret = default_interpret()
    n, d = xl.shape
    out = _spmm_sfused_padded(
        xl, xr, None if xv is xr else xv, a_tiles,
        meta.col_ids, meta.block_window, meta.block_first_in_window,
        cfg=meta.config, num_windows=meta.num_windows, interpret=interpret,
    )
    return out[:n, :d]


# ---------------------------------------------------------------------------
# Fused 3-term AGNN backward, condensed-tile space — the `spmm_sfused`
# counterpart of `_bd_sfused_bwd_kernel` (same algebra, same reasons):
# one pass over the SGT tiles yields the full dx sum AND the forward
# product u, reading each gathered slab once instead of 5×.
# ---------------------------------------------------------------------------
def _spmm_sfused_bwd_kernel(
    gwin_ref, gfirst_ref, a_ref, xw_ref, dyw_ref, xg_ref, dyg_ref,
    dx_ref, u_ref, *, blk_h, blk_w, group, compute_dtype,
):
    i = pl.program_id(0)
    prec = _mxu_precision(compute_dtype)
    ct = compute_dtype
    xw = xw_ref[:].astype(ct)    # [blk_h, d] — the group's window rows
    dyw = dyw_ref[:].astype(ct)
    acc_dx = jnp.zeros(dx_ref.shape, jnp.float32)
    acc_u = jnp.zeros(u_ref.shape, jnp.float32)
    dn = (((1,), (1,)), ((), ()))
    for k in range(group):
        xg_k = xg_ref[k * blk_w : (k + 1) * blk_w, :].astype(ct)
        dyg_k = dyg_ref[k * blk_w : (k + 1) * blk_w, :].astype(ct)
        a = a_ref[k].astype(ct)
        s = jax.lax.dot_general(
            xw, xg_k, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        t = jax.lax.dot_general(
            dyw, xg_k, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        w2 = jax.lax.dot_general(
            xw, dyg_k, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        cs = a * s.astype(ct)
        acc_dx += jnp.dot(
            cs, dyg_k, preferred_element_type=jnp.float32, precision=prec
        ) + jnp.dot(
            a * (t + w2).astype(ct), xg_k,
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc_u += jnp.dot(
            cs, xg_k, preferred_element_type=jnp.float32, precision=prec
        )

    @pl.when(gfirst_ref[i] == 1)
    def _():
        dx_ref[:] = acc_dx
        u_ref[:] = acc_u

    @pl.when(gfirst_ref[i] == 0)
    def _():
        dx_ref[:] += acc_dx
        u_ref[:] += acc_u


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_windows", "interpret")
)
def _spmm_sfused_bwd_padded(
    x, dy, a_tiles, col_ids, block_window, block_first,
    *, cfg, num_windows, interpret, xw=None, dyw=None,
):
    """One-pass fused AGNN backward.  ``xw``/``dyw`` optionally override
    the WINDOW-side sources (distributed split stream: guest windows carry
    owner rows, so the window layout differs from the gather slab);
    gathers always read ``x``/``dy`` through ``col_ids``."""
    n_blocks = a_tiles.shape[0]
    d = x.shape[1]
    group = cfg.block_group
    assert n_blocks % group == 0, (n_blocks, group)
    d_pad = lane_pad(d)
    gwin = block_window[::group]
    gfirst = block_first[::group]
    xw = x if xw is None else xw
    dyw = dy if dyw is None else dyw
    if cfg.compute_dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
        dy = dy.astype(jnp.bfloat16)
        xw = xw.astype(jnp.bfloat16)
        dyw = dyw.astype(jnp.bfloat16)

    def window_pad(a):
        # May exceed the window span (distributed extended slabs) — trim.
        a = a[: num_windows * cfg.blk_h]
        return jnp.pad(
            a, ((0, num_windows * cfg.blk_h - a.shape[0]), (0, d_pad - d))
        )

    def gather(a):
        ag = jnp.take(a, col_ids, axis=0, fill_value=0)
        if d_pad != d:
            ag = jnp.pad(ag, ((0, 0), (0, d_pad - d)))
        return ag

    kernel = functools.partial(
        _spmm_sfused_bwd_kernel, blk_h=cfg.blk_h, blk_w=cfg.blk_w,
        group=group, compute_dtype=cfg.compute_dtype,
    )
    win_spec = pl.BlockSpec((cfg.blk_h, d_pad), lambda b, w_, f_: (w_[b], 0))
    slab_spec = pl.BlockSpec(
        (group * cfg.blk_w, d_pad), lambda b, w_, f_: (b, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks // group,),
        in_specs=[
            pl.BlockSpec(
                (group, cfg.blk_h, cfg.blk_w), lambda b, w_, f_: (b, 0, 0)
            ),
            win_spec, win_spec, slab_spec, slab_spec,
        ],
        out_specs=[win_spec, win_spec],
    )
    out_sds = jax.ShapeDtypeStruct(
        (num_windows * cfg.blk_h, d_pad), jnp.float32
    )
    xg = gather(x)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_sds, out_sds],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * n_blocks * cfg.blk_h * cfg.blk_w * d_pad,
            bytes_accessed=2 * xg.size * xg.dtype.itemsize
            + 2 * n_blocks * cfg.blk_h * xg.dtype.itemsize * d_pad
            + a_tiles.size * a_tiles.dtype.itemsize
            + 2 * num_windows * cfg.blk_h * d_pad * 4,
            transcendentals=0,
        ),
    )(gwin, gfirst, a_tiles, window_pad(xw), window_pad(dyw), xg, gather(dy))


def spmm_sfused_bwd(
    x: jnp.ndarray,
    dy: jnp.ndarray,
    meta: JaxSGTMeta,
    a_tiles: jnp.ndarray,
    *,
    interpret: bool | None = None,
):
    """Fused AGNN backward over SGT condensed tiles; returns ``(dx3, u)``
    — see `_spmm_sfused_bwd_kernel` / `bd_sfused_bwd`."""
    if interpret is None:
        interpret = default_interpret()
    n, d = x.shape
    dx3, u = _spmm_sfused_bwd_padded(
        x, dy, a_tiles,
        meta.col_ids, meta.block_window, meta.block_first_in_window,
        cfg=meta.config, num_windows=meta.num_windows, interpret=interpret,
    )
    return dx3[:n, :d], u[:n, :d]


def spmm_tc(
    x: jnp.ndarray,
    meta: JaxSGTMeta,
    edge_weights: jnp.ndarray | None = None,
    *,
    interpret: bool | None = None,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Tensor-core SpMM: ``out = A @ x`` (optionally edge-weighted).

    Args:
      x: node features [N, D] (any float dtype; accumulation is f32).
      meta: SGT tiling of A (CSR rows = output nodes).
      edge_weights: per-CSR-edge weights [num_edges] for the AGNN path
        (``spmmAGNN_forward_cuda``, TCGNN_kernel.cu:459-578); None = binary A.
      interpret: force Pallas interpreter mode (default: auto off-TPU).
      d_tile: feature tile width (multiple of 128).

    Returns:
      [N, D] f32 aggregated features.
    """
    if interpret is None:
        interpret = default_interpret()
    cfg = meta.config
    n, d = x.shape
    d_pad = _round_up(max(d, 1), d_tile)
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))

    if edge_weights is None:
        weighted = False
        chunk_w = jnp.zeros_like(meta.chunk_r)  # unused placeholder
    else:
        weighted = True
        w_padded = jnp.concatenate(
            [edge_weights.astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
        )
        chunk_w = w_padded[meta.chunk_edge_id]

    out = _spmm_padded(
        x,
        meta.col_ids,
        meta.chunk_r,
        meta.chunk_c,
        chunk_w,
        meta.chunk_block,
        meta.chunk_window,
        meta.chunk_first_in_window,
        cfg=cfg,
        num_windows=meta.num_windows,
        weighted=weighted,
        interpret=interpret,
        d_tile=d_tile,
    )
    return out[:n, :d]
